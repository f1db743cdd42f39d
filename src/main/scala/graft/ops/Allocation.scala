package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKAgg

/** Exact-total proportional stratified sampling (C73): allocate a
  * GLOBAL sample budget `k` across strata by the Hamilton /
  * largest-remainder method (alloc_h ∝ n_h, Σ alloc_h = k exactly),
  * then select exactly alloc_h rows per stratum in deterministic
  * hash order.
  *
  * Why it's distinct from [[Sampling.stratifiedSample]] (C19,
  * fixed n PER group) and [[SystematicSampling]] (C62, ∝ per-ROW
  * weight): this is the "build a 10M-doc eval mix whose language
  * composition matches the corpus" step — the budget is global, the
  * strata proportions must be honored EXACTLY (floor-and-round ad-hoc
  * schemes over- or under-shoot k), and the selection must be
  * reproducible on any cluster.
  *
  * Scale shape, 100 TB framing:
  *  - stratum sizes are ONE partial-agg shuffle collapsing the corpus
  *    to ≤|strata| rows; the allocation arithmetic (integer quotas
  *    k·n_h // N, remainders, a row_number over remainders) runs on
  *    that broadcast-sized relation — the window there orders
  *    ≤|strata| rows, never corpus rows;
  *  - per-stratum selection reuses the C66 bounded heap
  *    ([[TopKAgg]]): map-side partial heaps mean the shuffle carries
  *    ≤ k ids per (task, stratum) instead of funneling every row of a
  *    stratum through one `row_number` task — the exact failure mode
  *    a `PARTITION BY lang` window has when one language is 80% of
  *    the corpus;
  *  - all decisions are integer arithmetic on md5-derived keys: no
  *    `rand()`, so the sample is stable under re-partitioning and
  *    reproducible by the DuckDB twin.
  *
  * Requires k ≤ N for the exact-Σ guarantee; allocations are
  * defensively capped at n_h (so k > N degrades to "take all").
  * Ties in remainders break by ascending stratum id.
  */
object Allocation {

  /** Returns (stratum, doc_id, rank, alloc, n_h): the selected rows,
    * rank 1..alloc_h within each stratum by (md5₆₀(id), id).
    */
  def proportionalSample(
      df: DataFrame,
      id: Column,
      stratum: Column,
      k: Int): DataFrame = {
    require(k >= 0, s"sample budget must be non-negative, got $k")

    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_h"))
    val total = counts.agg(sum(col("n_h")).as("n_tot"))

    // Hamilton allocation on the ≤|strata|-row relation. quota, base
    // and rem are exact bigint arithmetic (k·n_h ≤ k·N — no overflow
    // for any real k against bigint row counts).
    val quotas = counts.crossJoin(broadcast(total))
      .withColumn("quota_num", lit(k.toLong) * col("n_h"))
      .withColumn("rem", pmod(col("quota_num"), col("n_tot")))
      .withColumn("base", ((col("quota_num") - col("rem")) / col("n_tot")).cast("bigint"))
    // leftover seats = k − Σ base; the largest-remainder strata get
    // one extra seat each. Both windows below run over ≤|strata| rows.
    val wAll = Window.partitionBy(lit(1))
    val wRem = Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("stratum"))
    val alloc = quotas
      .withColumn("leftover", lit(k.toLong) - sum(col("base")).over(wAll))
      .withColumn("rem_rank", row_number().over(wRem))
      .withColumn("alloc",
        least(col("n_h"),
          col("base") + when(col("rem_rank") <= col("leftover"), 1L).otherwise(0L)))
      .select(col("stratum"), col("n_h"), col("alloc"))

    // Bounded per-stratum selection: alloc_h ≤ k always, so one C66
    // heap of size k per stratum admits every possible winner; the
    // heap's total order (score desc, id asc) with score = −hash is
    // exactly ascending (hash, id).
    val picked = df
      .select(stratum.as("stratum"), id.cast("bigint").as("doc_id"),
        (-Dedup.md5Hash60(id.cast("string"))).as("neg_h"))
      .groupBy(col("stratum"))
      .agg(TopKAgg.topK(col("neg_h"), col("doc_id"), math.max(k, 1)).as("top"))
      .select(col("stratum"), posexplode(col("top")))
      .select(col("stratum"), col("col.id").as("doc_id"),
        (col("pos") + 1).cast("bigint").as("rank"))

    picked.join(broadcast(alloc), "stratum")
      .filter(col("rank") <= col("alloc"))
      .select(col("stratum"), col("doc_id"), col("rank"),
        col("alloc").cast("bigint").as("alloc"), col("n_h"))
  }
}
