package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{IntervalUnion, KCenter, NaiveBayes}

/** Round-8 session-3 additions, part 5: k-center coreset selection
  * (C121), one-pass multinomial Naive Bayes (C122), and per-key
  * interval-union coverage (A51).
  */
object Round8gQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Coreset size for the k-center traversal. */
  val KCenters = 8

  /** Interval length: floor(value) x 10 minutes in microseconds. */
  val IvUnitUs = 600000000L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C121: 8 maximally-spread exemplar embeddings (greedy Gonzalez)
    // with selection-time radii and final coverage counts.
    "q_kcenter" -> { (s, dir) =>
      KCenter.select(t(s, dir, "embeddings"), col("vec_id"), col("embedding"),
        k = KCenters)
    },

    // C122: language-ID confusion matrix of the one-pass NB
    // classifier, trained on the 80% hash split, scored on the 20%.
    "q_nbayes" -> { (s, dir) =>
      NaiveBayes.confusion(t(s, dir, "documents"),
        col("doc_id"), col("text"), col("lang"))
    },

    // A51: per-user activity coverage — events carry a floor(value)
    // x 10 min activity interval; overlaps merge into islands.
    "q_interval_union" -> { (s, dir) =>
      val u = unix_micros(col("ts"))
      val iv = t(s, dir, "events").select(col("user_id").as("key"),
        u.as("s"),
        (u + expr(s"CAST(floor(value) AS BIGINT) * $IvUnitUs")).as("e"))
      IntervalUnion.unionStats(iv, col("key"), col("s"), col("e"))
        .orderBy(col("key"))
    }
  )

  val oracles: Map[String, String] = Map(

    "q_kcenter" -> KCenter.selectSql(KCenters),

    "q_nbayes" -> NaiveBayes.confusionSql(),

    "q_interval_union" ->
      s"""WITH iv AS (SELECT user_id AS key,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS s,
         |    epoch_us(CAST(ts AS TIMESTAMP))
         |      + CAST(floor(value) AS BIGINT) * $IvUnitUs AS e
         |  FROM events),
         |${IntervalUnion.unionStatsSqlTail}
         |ORDER BY key""".stripMargin
  )
}
