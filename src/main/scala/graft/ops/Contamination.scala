package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag corpus documents that
  * share too many word n-grams with an evaluation set.
  *
  * Scale shape: eval sets are tiny (thousands of documents) next to
  * a 100 TB corpus, so the eval n-gram vocabulary is collected into
  * a BROADCAST hash relation of fixed-width 60-bit hashes — the
  * corpus side streams through a map-side hash join with no shuffle
  * of corpus text, and only the (doc_id, hit) pairs that survive the
  * join reach the per-doc count aggregation (a shuffle of bigint
  * pairs). Corpus documents are scanned exactly once.
  */
object Contamination {

  /** Per corpus doc: distinct-shingle overlap with the eval set's
    * shingle vocabulary. Returns (doc_id, n_shingles, n_overlap,
    * overlap_frac rounded to 4dp, contaminated flag at `minFrac`).
    */
  def overlap(corpus: DataFrame, id: Column, text: Column,
      eval: DataFrame, evalText: Column,
      shingleK: Int, minFrac: Double): DataFrame = {
    val evalVocab = eval
      .select(explode(TextAnalysis.wordShingles(evalText, shingleK)).as("sh"))
      .select(Dedup.md5Hash60(col("sh")).as("shash"))
      .distinct()
    // ONE corpus pass: shingle totals ride along with every exploded
    // shingle (n_shingles is functionally dependent on doc_id), the
    // broadcast vocabulary marks hits with a LEFT join so
    // zero-overlap docs survive, and the per-doc sum's map-side
    // partial aggregation shrinks the shuffle to one row per doc per
    // map partition. wordShingles is distinct per doc, so summing
    // hit flags is already a distinct-overlap count.
    val counted = corpus
      .select(id.as("doc_id"), TextAnalysis.wordShingles(text, shingleK).as("shs"))
      .select(col("doc_id"), size(col("shs")).cast("bigint").as("n_shingles"),
        explode(col("shs")).as("sh"))
      .select(col("doc_id"), col("n_shingles"), Dedup.md5Hash60(col("sh")).as("shash"))
      .join(broadcast(evalVocab.withColumn("hit", lit(1L))), Seq("shash"), "left")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
    counted
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"))
      .withColumn("overlap_frac",
        when(col("n_shingles") > 0,
          round(col("n_overlap").cast("double") / col("n_shingles"), 4))
          .otherwise(lit(0.0)))
      .withColumn("contaminated",
        (col("n_overlap") * lit(10000L) >=
          lit((minFrac * 10000).round) * col("n_shingles")).cast("int"))
  }
}
