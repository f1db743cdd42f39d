package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Conformal, CrossVal, Dedup, Features, LinearClassifier, RankEval}

/** Round-8 session-3 additions, part 3 — the classifier-deployment
  * eval suite: cross-validated label-noise audit (C116),
  * split-conformal coverage gate (C117), decile lift/gains table
  * (C118).
  */
object Round8eQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Label-noise audit: folds x epochs sized to keep the unrolled
    * oracle at 6 fit blocks.
    */
  val NoiseFolds = 3
  val NoiseEpochs = 2

  /** Conformal miscoverage level (alpha = 0.1 -> 90% target). */
  val ConfAlphaMilli = 100L

  /** Lift table bands. */
  val LiftBands = 10

  private def labels(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("bigint").as("doc_id"),
      when(col("lang") === "en", 1).otherwise(-1).as("y"))

  private def fitScored(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = LinearClassifier.fitPerceptron(
      Features.hashedBow(docs, col("doc_id"), col("text"), Round8Queries.ClsDim),
      labels(docs), Round8Queries.ClsDim, Round8Queries.ClsEpochs)
    LinearClassifier.score(
        Features.hashedBow(docs, col("doc_id"), col("text"), Round8Queries.ClsDim),
        model)
      .join(labels(docs), Seq("doc_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C116: every labeled doc scored by the fold model that never
    // saw it; a confident contradiction flags the LABEL.
    "q_label_noise" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      CrossVal.labelNoiseAudit(docs, col("doc_id"), col("text"),
          labels(docs), Round8Queries.ClsDim, NoiseEpochs, NoiseFolds)
        .orderBy(col("doc_id"))
    },

    // C117: conformal acceptance threshold calibrated on half the
    // positives (by id hash), coverage audited on the other half.
    "q_conformal" -> { (s, dir) =>
      val pos = fitScored(s, dir).filter(col("y") === 1)
        .select(col("doc_id"), (-col("margin")).as("s"),
          (Dedup.md5Hash60(concat(lit("conf:"), col("doc_id").cast("string")))
            % 2).as("half"))
      Conformal.coverageAudit(
        pos.filter(col("half") === 0L).select(col("s")),
        pos.filter(col("half") === 1L).select(col("s")),
        ConfAlphaMilli)
    },

    // C118: decile gains table of the fitted gate — how much of the
    // English signal the top score bands capture.
    "q_lift" -> { (s, dir) =>
      RankEval.liftTable(fitScored(s, dir), col("doc_id"), col("margin"),
          col("y") === 1, LiftBands)
        .orderBy(col("band"))
    }
  )

  val oracles: Map[String, String] = Map(

    "q_label_noise" ->
      s"""${Round8Queries.preludeBase},
         |${CrossVal.auditSqlTail(NoiseEpochs, NoiseFolds)}""".stripMargin,

    "q_conformal" -> {
      val h = "('0x' || substr(md5('conf:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2"
      s"""${Round8Queries.prelude},
         |${Round8Queries.finalScoredCte},
         |pos AS (SELECT doc_id, -margin AS s, $h AS half FROM fsc WHERE y = 1),
         |cal AS (SELECT s FROM pos WHERE half = 0),
         |ev AS (SELECT s FROM pos WHERE half = 1),
         |${Conformal.coverageAuditSqlTail(ConfAlphaMilli)}""".stripMargin
    },

    "q_lift" ->
      s"""${Round8Queries.prelude},
         |${Round8Queries.finalScoredCte},
         |lifted AS (SELECT doc_id, margin, CASE WHEN y = 1 THEN 1 ELSE 0 END AS y
         |           FROM fsc)
         |${RankEval.liftSql("lifted", LiftBands)}""".stripMargin
  )
}
