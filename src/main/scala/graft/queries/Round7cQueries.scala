package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Decontaminate, Outliers, SemanticDedup}

/** Round-7 continuation: robust outlier gating and cross-corpus
  * semantic decontamination.
  */
object Round7cQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** MAD multiples for the outlier gate, in milli-units (2500 = 2.5·MAD). */
  val OutlierKMilli = 2500L
  /** Same anchors/threshold family as q_semantic_dedup (C54). */
  val DeconThreshold = 0.25
  val DeconAnchors: Seq[Seq[Double]] = SemanticDedup.anchors(dim = 64, k = 64)
  /** Eval split: every 20th embedding plays the eval set. */
  val EvalMod = 20L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C79: per-group robust outlier gate — median/MAD from the A40
    // distinct-value-histogram device, never a per-row group window.
    "q_robust_outliers" -> { (s, dir) =>
      Outliers.robustFlags(t(s, dir, "documents"),
          col("doc_id"), col("lang"), col("n_chars"), OutlierKMilli)
        .select(col("id").as("doc_id"), col("group").as("lang"),
          col("value").as("n_chars"), col("med"), col("mad"),
          col("robust_z_milli"), col("is_outlier"))
        .orderBy(col("doc_id"))
    },

    // C80: semantic decontamination — train rows sharing an anchor
    // cell with an eval row at cosine >= threshold; eval broadcast,
    // train never shuffles.
    "q_semantic_decon" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val eval = emb.filter(pmod(col("vec_id"), lit(EvalMod)) === 0)
      val train = emb.filter(pmod(col("vec_id"), lit(EvalMod)) =!= 0)
      Decontaminate.semanticHits(train, col("vec_id"), col("embedding"),
          eval, col("vec_id"), col("embedding"), DeconThreshold, DeconAnchors)
        .orderBy(col("train_id"))
    })

  val oracles: Map[String, String] = Map(

    "q_robust_outliers" ->
      s"""WITH ${Outliers.robustFlagsSql("documents", "doc_id", "lang", "n_chars", OutlierKMilli)}
         |SELECT id AS doc_id, "group" AS lang, value AS n_chars,
         |  med, mad, robust_z_milli, is_outlier
         |FROM rof ORDER BY doc_id""".stripMargin,

    "q_semantic_decon" ->
      s"""WITH ${Decontaminate.semanticHitsSql(
             s"vec_id % $EvalMod <> 0", s"vec_id % $EvalMod = 0",
             DeconThreshold, DeconAnchors)}
         |SELECT train_id, n_eval_hits, max_cos
         |FROM sdh ORDER BY train_id""".stripMargin)
}
