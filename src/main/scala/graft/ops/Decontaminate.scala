package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.BloomSketch

/** Benchmark decontamination: REMOVE every corpus document sharing any
  * word k-shingle with an evaluation set (the hard-removal complement
  * of [[Contamination]], which only flags and scores overlap).
  *
  * Scale shape: the eval shingle vocabulary collapses to (a) a bloom
  * filter — ONE binary blob of ~10 bits/entry, broadcast as a one-row
  * scalar — and (b) the exact 60-bit hash relation. The corpus streams
  * through the bloom probe FIRST: at 100 TB the overwhelming majority
  * of corpus shingles miss the eval set, and each miss is answered by
  * k bit-probes into broadcast-local memory with NO join machinery and
  * no false negatives, so only the tiny surviving sliver (true hits +
  * ~FP-rate of the corpus) reaches the exact semi-join that kills the
  * false positives. The final result provably EQUALS the plain exact
  * semi-join's (bloom has no false negatives; the confirm join removes
  * its false positives) — which is why `q_decontaminate` stays DuckDB-
  * oracle-able even though a sketch sits in the hot path.
  *
  * Past broadcast size the same shape degrades gracefully: the bloom
  * (10× smaller than the hash relation) keeps broadcasting long after
  * the exact vocab must shuffle, so the prefilter still prunes the
  * shuffle down to the sliver.
  */
object Decontaminate {

  /** Corpus rows (all columns) whose documents share NO distinct
    * k-shingle with the eval set. Eval docs present in the corpus
    * remove themselves (a doc's shingles are its own vocabulary hits).
    */
  def cleanDocs(corpus: DataFrame, id: Column, text: Column,
      eval: DataFrame, evalText: Column, shingleK: Int,
      bloomBits: Int = BloomSketch.DefaultBits,
      bloomHashes: Int = BloomSketch.DefaultHashes): DataFrame = {
    val vocab = eval
      .select(explode(TextAnalysis.wordShingles(evalText, shingleK)).as("sh"))
      .select(Dedup.md5Hash60(col("sh")).as("shash"))
      .distinct()
    // The bloom rides in as a SCALAR SUBQUERY, not a one-row
    // cross-join: a cross-join probe becomes a join CONDITION, and
    // PushLeftSemiLeftAntiThroughJoin then hoists the exact confirm
    // semi-join below it — running the expensive join first and the
    // prefilter after (observed on the first cut of this operator). A
    // scalar subquery keeps the probe a plain Filter, which the
    // semi-join cannot be pushed beneath, so the plan keeps
    // probe-then-confirm. The subquery runs once; its bytes ship with
    // the (broadcast) task binary, so executors still hold them once.
    val bloomBytes =
      vocab.agg(BloomSketch.sketch(col("shash"), bloomBits, bloomHashes).as("__bloom")).scalar()
    val dirty = corpus
      .select(id.as("__doc_id"), explode(TextAnalysis.wordShingles(text, shingleK)).as("sh"))
      .select(col("__doc_id"), Dedup.md5Hash60(col("sh")).as("shash"))
      .filter(BloomSketch.mightContain(bloomBytes, col("shash")))
      .join(broadcast(vocab), Seq("shash"), "left_semi") // exact confirm: FPs die here
      .select(col("__doc_id"))
      .distinct()
    corpus.join(dirty, id === col("__doc_id"), "left_anti")
  }
}
