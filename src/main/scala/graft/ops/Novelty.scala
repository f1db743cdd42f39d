package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.WordShinglesExpr

/** Document novelty scoring: the fraction of a document's distinct
  * word k-shingles that occur in NO other document of the corpus.
  * High novelty = original content worth keeping; near-zero novelty =
  * the document is assembled from boilerplate/template text even when
  * no single pair-wise near-duplicate exists — the corpus-level
  * signal the pair-wise dedup family (C4–C6) cannot see.
  *
  * Scale shape: one shingle pass (the codegen'd [[WordShinglesExpr]]
  * kernel), one explode, and ONE partial-aggregated count keyed by
  * the 60-bit shingle hash — fixed-width shuffle keys, never the
  * shingle string (the C52 lesson). The roll-up never joins back
  * against the exploded stream: per-doc shingles are already
  * distinct, so a corpus-unique shingle (occurrence count 1) has
  * exactly ONE owner doc, and `min(doc_id)` inside the same
  * aggregate IS that owner — unique counts then reduce by doc_id
  * over at most |docs| rows, and the final join touches one row per
  * document on each side.
  */
object Novelty {

  /** Score each document's shingle novelty.
    *
    * @return (doc_id, n_shingles, n_unique, novelty) — novelty =
    *         n_unique / n_shingles rounded to 4 places.
    */
  def score(df: DataFrame, id: Column, text: Column, shingleK: Int = 3): DataFrame = {
    val base = df.select(id.cast("bigint").as("doc_id"),
      WordShinglesExpr.shingles(text, shingleK).as("shingles"))
    val perDoc = base.select(col("doc_id"),
      size(col("shingles")).cast("bigint").as("n_shingles"))

    val uniquePerDoc = base
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"), Dedup.md5Hash60(col("s")).as("shash"))
      .groupBy(col("shash"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("owner"))
      .filter(col("df") === 1)
      .groupBy(col("owner").as("doc_id"))
      .agg(count(lit(1)).as("n_unique"))

    perDoc.join(uniquePerDoc, Seq("doc_id"), "left")
      .withColumn("n_unique", coalesce(col("n_unique"), lit(0L)))
      .withColumn("novelty",
        when(col("n_shingles") > 0,
          round(col("n_unique").cast("double") / col("n_shingles"), 4))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"), col("novelty"))
  }
}
