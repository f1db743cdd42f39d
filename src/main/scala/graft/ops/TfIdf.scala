package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sparse idf-weighted all-pairs document similarity (C74): cosine
  * over the idf-weighted shingle-incidence vectors, computed by an
  * inverted-index (posting-list) self-join with document-frequency
  * pruning — the Bayardo-style all-pairs similarity search that
  * complements the existing near-dup family: MinHash (C2) and n-gram
  * Jaccard (C4) treat every shingle equally; idf weighting makes a
  * shared RARE shingle count for more than a shared boilerplate one,
  * and cosine (unlike C67's containment) is symmetric and
  * norm-calibrated.
  *
  * Scale shape, 100 TB framing:
  *  - the corpus collapses once to (doc, shingle-hash) postings; all
  *    joins key on the fixed-width 60-bit hash, text never shuffles;
  *  - the pair join only runs through postings with df ∈ [2, maxDf]:
  *    per-shingle fan-out is ≤ maxDf²/2 BY CONSTRUCTION (the C67
  *    rare-anchor device), so boilerplate shingles can never emit a
  *    quadratic candidate set — there is no LSH to fit and no skew
  *    cliff, and AQE never sees a hot key larger than maxDf²;
  *  - determinism: weights are integer milli-idf (floor(1000·ln) of a
  *    ratio of exact integers — the C53/C40 quantize-before-sum
  *    device), so dot products and squared norms are EXACT bigint
  *    sums, reproducible under any partitioning and by the DuckDB
  *    twin; the only floating-point steps are one sqrt/divide per
  *    emitted pair.
  *
  * df=1 shingles never pair but DO contribute to norms: the operator
  * computes true cosine in the df ≤ maxDf term space (df > maxDf
  * terms are dropped from the space entirely — the classic stopword
  * prune, which is what makes all-pairs tractable at all).
  */
object TfIdf {

  /** Similar pairs (id_a < id_b) with cosine ≥ threshold in the
    * df-pruned idf-weighted shingle space:
    * (id_a, id_b, dot_milli2, cosine).
    */
  def similarPairs(
      docs: DataFrame,
      id: Column,
      text: Column,
      shingleK: Int,
      maxDf: Int,
      threshold: Double): DataFrame = {
    require(maxDf >= 2, s"maxDf must admit at least one pair, got $maxDf")

    // distinct (doc, shingle-hash) postings; one pass over the text
    // persisted: the df count, the weighted join, the norm agg and
    // the pair join all read this stream — unpersisted, the
    // tokenize+shingle+md5 subtree re-evaluates per consumer
    // (measured 1.9 s → 1.0 s at sf0.1)
    val postings = docs
      .select(id.as("doc_id"),
        explode(TextAnalysis.wordShingles(text, shingleK)).as("sh"))
      .select(col("doc_id"), Dedup.md5Hash60(col("sh")).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = docs.agg(count(lit(1)).as("n_docs"))

    // integer milli-idf per surviving shingle: exact-integer ratio
    // through one ln, floored BEFORE any sum
    val dfc = postings.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .crossJoin(broadcast(n))
      .withColumn("idf",
        floor(log((col("n_docs") + lit(1L)).cast("double") /
          (col("df") + lit(1L)).cast("double")) * lit(1000.0)).cast("bigint"))
      .select(col("h"), col("df"), col("idf"))
    // the posting ⋈ df join is the one corpus-sized sort-merge join
    // here and BOTH the norm aggregate and the pair join read its
    // output — persist it or it runs twice (the join output is the
    // rare-shingle postings only, far smaller than its inputs)
    val w = postings.join(dfc, "h")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val normsq = w.groupBy(col("doc_id"))
      .agg(sum(col("idf") * col("idf")).as("nsq"))

    // posting self-join, df >= 2 only; fan-out ≤ maxDf²/2 per shingle
    val pairable = w.filter(col("df") >= 2)
    val dots = pairable.as("a")
      .join(pairable.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(sum(col("a.idf") * col("b.idf")).as("dot_milli2"))

    val na = normsq.select(col("doc_id").as("id_a"), col("nsq").as("nsq_a"))
    val nb = normsq.select(col("doc_id").as("id_b"), col("nsq").as("nsq_b"))
    dots.join(na, "id_a").join(nb, "id_b")
      .withColumn("cosine",
        col("dot_milli2").cast("double") /
          (sqrt(col("nsq_a").cast("double")) * sqrt(col("nsq_b").cast("double"))))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("dot_milli2"), col("cosine"))
  }
}
