package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe dataset splits: assigning train/valid/test by
  * per-document hash (C19's [[Sampling.assignSplit]]) silently leaks
  * when the corpus contains near-duplicates — two ~identical
  * documents land in different splits and the eval set is
  * contaminated by construction. The fix used by every serious
  * pretraining pipeline: split by duplicate CLUSTER, not by document,
  * so a near-dup group moves as one unit.
  *
  * Scale shape: the cluster closure is C21's min-label propagation
  * ((id, label) pairs shuffle, never text); the split decision is a
  * pure narrow hash expression on the cluster id; documents outside
  * any pair graph never enter the propagation — they join nothing
  * (broadcast-sized component table for realistic dup rates, else a
  * keyed shuffle on the 8-byte doc id) and fall back to their own id
  * as a singleton cluster. Growth-stable like C19: new documents
  * never move an existing cluster between splits.
  */
object Splits {

  /** Assign every document a split so that near-duplicates share it.
    *
    * @param docs   one row per document
    * @param id     document id column (cast to bigint)
    * @param pairs  near-dup edges (id_a, id_b) from any C2-C5 detector
    * @param splits (label, fraction) list, fractions summing to <= 1
    * @return (doc_id, cluster_id, split); cluster_id is the C21
    *         min-reachable-id label, doc_id itself for singletons
    */
  def clusterSplit(docs: DataFrame, id: Column, pairs: DataFrame,
      splits: Seq[(String, Double)], maxIter: Int = 20): DataFrame = {
    val comp = DupClusters.connectedComponents(pairs, maxIter)
    docs.select(id.cast("bigint").as("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        Sampling.assignSplit(col("cluster_id").cast("string"), splits))
  }

  /** Stratified k-fold assignment: within every stratum the folds
    * are EXACTLY balanced (sizes differ by at most one) — the
    * cross-validation guarantee plain hash-bucketing (C19) cannot
    * give, because a hash split's per-stratum fold sizes are only
    * balanced in expectation.
    *
    * fold = per-stratum rank of the document's seeded 60-bit hash,
    * mod k. The rank uses the distributed prefix device from
    * [[EpochShuffle]] — per-(stratum, hash-range) counts prefix-sum
    * in a tiny window and broadcast back, within-range ranks are
    * range-partitioned — so a billion-row stratum never funnels
    * through one window task the way a naive
    * row_number() OVER (PARTITION BY stratum) would.
    *
    * @return (doc_id, stratum, fold) with fold in [0, k)
    */
  def stratifiedKFold(
      docs: DataFrame,
      id: Column,
      stratum: Column,
      k: Int,
      seed: String = "kfold"): DataFrame = {
    require(k >= 2, "k >= 2")
    import org.apache.spark.sql.expressions.Window
    val ranges = 256
    val rangeWidth = Sampling.HashSpace / ranges
    val rows = docs.select(id.cast("bigint").as("doc_id"), stratum.as("stratum"))
      .withColumn("hkey",
        Dedup.md5Hash60(concat(lit(seed + ":"), col("doc_id").cast("string"))))
      .withColumn("coarse", expr(s"hkey DIV ${rangeWidth}L"))

    val wOff = Window.partitionBy(col("stratum")).orderBy(col("coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy(col("stratum"), col("coarse"))
      .agg(count(lit(1)).as("cs"))
      .withColumn("offset", coalesce(sum(col("cs")).over(wOff), lit(0L)))
      .select(col("stratum"), col("coarse"), col("offset"))

    val wIn = Window.partitionBy(col("stratum"), col("coarse"))
      .orderBy(col("hkey"), col("doc_id"))
    rows.join(broadcast(offsets), Seq("stratum", "coarse"))
      .withColumn("rank", col("offset") + row_number().over(wIn).cast("bigint") - 1L)
      .select(col("doc_id"), col("stratum"),
        (col("rank") % k).cast("int").as("fold"))
  }
}
