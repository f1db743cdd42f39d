package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-rollup
  * pattern of a partitioned 100 TB pipeline: yesterday's aggregate
  * state + today's partition, WITHOUT rescanning history. Every
  * carried statistic is MERGEABLE (count, sum, min, max, HLL
  * sketch), so "update the rollup" is itself just aggregation:
  * union the state table with the new batch's partial aggregate and
  * re-aggregate by group. merge(agg(A), agg(B)) == agg(A ∪ B) by
  * construction — the spec pins it, the oracled query proves the
  * merged path against a one-shot DuckDB groupBy of the full data.
  *
  * Scale shape: each batch is one partial-agg shuffle over ITS OWN
  * rows; the merge shuffles only |groups| state rows. History never
  * re-reads. Exact distinct is the one non-mergeable statistic —
  * carried as the C17 HLL sketch (register-max merge is associative
  * and commutative, so merged bytes are identical to a one-shot
  * sketch of the union).
  */
object IncrementalAgg {

  /** Aggregate one batch into state rows:
    * (group, n, sum_v, min_v, max_v, dsketch).
    */
  def aggregate(batch: DataFrame, group: Column, value: Column, distinctKey: Column): DataFrame =
    batch
      .select(group.as("group"), value.cast("bigint").as("v"),
        distinctKey.cast("string").as("k"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        graft.plans.HllSketch.hllSketch(col("k")).as("dsketch"))

  /** Merge any number of state tables (previous state + new batch
    * partials): union + re-aggregate on the mergeable statistics.
    */
  def merge(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("group"))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        graft.plans.HllSketch.hllUnion(col("dsketch")).as("dsketch"))

  /** Human-readable view of a state table: sketch rendered as its
    * distinct estimate.
    */
  def estimates(state: DataFrame): DataFrame =
    state.select(col("group"), col("n"), col("sum_v"), col("min_v"), col("max_v"),
      graft.plans.HllSketch.hllEstimate(col("dsketch")).as("n_distinct_est"))
}
