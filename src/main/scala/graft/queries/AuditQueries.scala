package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Diagnostics, Privacy, Profiler}

/** Data-audit queries: k-anonymity / l-diversity (C107), Benford
  * leading-digit audit (C112), and pre-shuffle key-skew diagnosis
  * (C76).
  */
object AuditQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** k-anonymity threshold and QI length-bucket width. */
  val AnonK = 5
  val AnonBucket = 256

  /** Heavy-key list depth for the skew diagnosis. */
  val SkewTopN = 10

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C107: k-anonymity equivalence classes over (lang, length
    // bucket) with source as the sensitive attribute (l-diversity).
    "q_k_anonymity" -> { (s, dir) =>
      Privacy.kAnonymity(t(s, dir, "documents"),
          Seq("lang" -> col("lang"),
            "chars_bucket" -> expr(s"n_chars DIV $AnonBucket")),
          col("source"), AnonK)
        .orderBy(col("lang"), col("chars_bucket"))
    },

    // C112: Benford leading-digit audit over lineitem prices in
    // integer cents — fabricated-data smell test for the profiler.
    "q_benford" -> { (s, dir) =>
      Profiler.benfordAudit(t(s, dir, "lineitem"),
          floor(col("l_extendedprice") * 100).cast("bigint"))
        .orderBy(col("digit"))
    },

    // C76: key-skew diagnosis — heavy keys via the bounded heap plus
    // exact nearest-rank group-size percentiles; the pre-shuffle audit
    // that decides salting/AQE for a key.
    "q_key_skew" -> { (s, dir) =>
      Diagnostics.keySkew(t(s, dir, "events"), col("user_id"), SkewTopN)
        .orderBy(col("rank"))
    }
  )

  val oracles: Map[String, String] = Map(

    "q_k_anonymity" ->
      s"""SELECT lang, n_chars // $AnonBucket AS chars_bucket,
         |  CAST(count(*) AS BIGINT) AS class_size,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sensitive,
         |  CAST(CASE WHEN count(*) < $AnonK THEN 1 ELSE 0 END AS INTEGER) AS at_risk
         |FROM documents
         |GROUP BY lang, n_chars // $AnonBucket
         |ORDER BY lang, chars_bucket""".stripMargin,

    "q_benford" -> {
      val expVals = Profiler.BenfordMicro.zipWithIndex
        .map { case (m, i) => s"(${i + 1}, ${m})" }.mkString(", ")
      s"""WITH exp(digit, exp_micro) AS (VALUES $expVals),
         |u AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS u
         |      FROM lineitem WHERE floor(l_extendedprice * 100) > 0),
         |obs AS (SELECT CAST(substr(CAST(u AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         |          count(*) AS n
         |        FROM u GROUP BY 1),
         |t AS (SELECT sum(n) AS tot FROM obs)
         |SELECT e.digit, CAST(coalesce(obs.n, 0) AS BIGINT) AS n,
         |  CAST((1000000 * coalesce(obs.n, 0)) // t.tot AS BIGINT) AS obs_micro,
         |  CAST(e.exp_micro AS BIGINT) AS exp_micro,
         |  CAST(abs((1000000 * coalesce(obs.n, 0)) // t.tot - e.exp_micro)
         |    AS BIGINT) AS dev_micro
         |FROM exp e LEFT JOIN obs ON obs.digit = e.digit, t
         |ORDER BY e.digit""".stripMargin
    },

    "q_key_skew" ->
      Diagnostics.keySkewSql("events", "user_id", SkewTopN)
  )
}
