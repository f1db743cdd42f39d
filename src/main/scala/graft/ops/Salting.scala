package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations: deterministic salting.
  * AQE's skew-join handling covers sort-merge joins at runtime; salting
  * is the plan-level tool when a known hot key (the empty document,
  * the null user, the megacity stop) would otherwise put one
  * partition hours behind.
  */
object Salting {

  /** Deterministic salt in [0, buckets) derived from arbitrary
    * distinguishing columns (NOT the join key — e.g. an id or the
    * row's natural unique column).
    */
  def saltFrom(buckets: Int, distinguishing: Column*): Column =
    pmod(xxhash64(distinguishing: _*), lit(buckets.toLong)).cast("int")

  /** Join a skewed large side to a small side on `key`, spreading each
    * large-side key over `buckets` partitions: the large side gets a
    * per-row salt, the small side is replicated `buckets` times. The
    * shuffle key becomes (key, salt) — hot keys fan out, the result is
    * identical to the unsalted join.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int,
      distinguishing: Column): DataFrame = {
    val salted = large.withColumn("graft_salt", saltFrom(buckets, distinguishing))
    val replicated = small.withColumn("graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "graft_salt")).drop("graft_salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), final aggregate on key. `partialAggs` and
    * `finalAggs` must compose (sum/sum, count/sum, min/min, max/max).
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      buckets: Int,
      distinguishing: Column,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame =
    df.withColumn("graft_salt", saltFrom(buckets, distinguishing))
      .groupBy(col(key), col("graft_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
}
