package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-span detection — the substring-level view of corpus
  * duplication (the signal behind "dedup at the span level, not the
  * document level": boilerplate sentences, license headers, and
  * copy-pasted passages recur across documents that are NOT
  * near-duplicates of each other, and span statistics find them
  * where document-level MinHash cannot).
  *
  * A span is a window of `k` consecutive whitespace tokens; a span is
  * *duplicated* when it occurs in two or more distinct documents.
  * Per document we report how many of its distinct spans are
  * duplicated — the "fraction of this document that exists elsewhere
  * in the corpus" metric used to gate span-level rewriting.
  *
  * Scale shape: documents tokenize once (narrow); each doc emits its
  * DISTINCT spans as 60-bit hashes, so the only data-sized exchanges
  * shuffle fixed-width (doc_id, span_hash) pairs — never text. One
  * shuffle counts containing-docs per span hash (rows are already
  * distinct per doc, so `count(*)` IS the document frequency — no
  * countDistinct state), one hash join restricts to duplicated spans
  * (the duplicated-span set is a small fraction of all spans; AQE
  * broadcasts it when it fits), one shuffle re-keys hits by doc. The
  * exploded hash stream is persisted so candidates and doc totals
  * read one materialization.
  */
object DupSpans {

  /** Per-doc duplicated-span statistics: (doc_id, n_spans,
    * n_dup_spans, dup_span_frac) where n_spans counts the doc's
    * distinct k-token spans, n_dup_spans those occurring in >= 2
    * distinct docs, and dup_span_frac their 4dp-rounded ratio.
    * Docs shorter than k tokens contribute their whole token stream
    * as a single span (mirroring [[TextAnalysis.wordShingles]]).
    */
  def duplicatedSpans(df: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    require(k >= 2, s"span width must be >= 2 tokens, got $k")
    val docs = df.select(
      id.cast("bigint").as("doc_id"),
      TextAnalysis.wordShingles(text, k).as("spans")) // kernel output is already distinct
    val ex = docs
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), Dedup.md5Hash60(col("s")).as("shash"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val duplicated = ex.groupBy(col("shash"))
      .agg(count(lit(1)).as("span_df")) // rows distinct per doc => df
      .filter(col("span_df") >= 2)
      .select(col("shash"))
    val hits = ex.join(duplicated, Seq("shash"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"))
    // doc totals come from the SAME persisted hash stream (one row
    // per distinct span per doc, and every doc has >= 1 span), so the
    // tokenize+shingle kernel runs exactly once over the corpus
    ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(col("n_spans") > 0,
          round(coalesce(col("n_dup_spans"), lit(0L)).cast("double") / col("n_spans"), 4))
          .otherwise(lit(0.0)).as("dup_span_frac"))
  }
}
