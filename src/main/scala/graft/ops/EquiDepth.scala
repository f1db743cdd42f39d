package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Equi-depth (equal-frequency) histogram — the selectivity-estimation
  * and skew-inspection complement of the fixed-width histogram (A29):
  * bucket boundaries chosen so each bucket holds ~n/B rows.
  *
  * Scale shape: the global order runs over the DISTINCT-VALUE
  * histogram, not the rows — one partial-agg shuffle collapses the
  * corpus to (value, count), and the cumulative window then ranks
  * |distinct values| entries (prices, lengths, scores: bounded and
  * tiny next to row count; for truly-unbounded doubles, quantize
  * first or use the C25 mergeable quantile sketch to get boundaries).
  * Every row of a value lands in the bucket of that value's first
  * row (`floor(cum_before * B / n)`) — pure integer arithmetic, so
  * ties break identically in any engine and the result is
  * oracle-exact, unlike `ntile` over raw rows whose intra-tie order
  * is engine-private.
  */
object EquiDepth {

  /** Coarse ranges for the distributed prefix sum: few enough that
    * the offset window is trivially small, many enough to spread the
    * per-range cumulative windows.
    */
  private final val PrefixRanges = 64L

  /** (bucket, n_rows, n_values, min_val, max_val) over `value` cast
    * to bigint, with `buckets` target buckets. The cumulative window
    * here is unpartitioned — bounded by |distinct values| per the
    * documented contract (quantize first for unbounded doubles);
    * [[histogramPartitioned]] is the two-pass variant for domains too
    * wide for one partition (identical results, ~3 extra tiny
    * shuffles — measured 3× slower at bench sizes, which is why it
    * is opt-in rather than the default).
    */
  def histogram(df: DataFrame, value: Column, buckets: Int): DataFrame = {
    require(buckets >= 1)
    val counts = valueCounts(df, value)
    bucketize(cumSingle(counts), counts.agg(sum(col("c")).as("n")), buckets)
  }

  /** NULLs are excluded on BOTH sides (engines disagree on null sort
    * order: Spark windows default NULLS FIRST, DuckDB nulls_last —
    * including them would shift every bucket boundary differently).
    */
  private def valueCounts(df: DataFrame, value: Column): DataFrame =
    df.select(value.cast("bigint").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))

  private[ops] def cumSingle(counts: DataFrame): DataFrame = {
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    counts.withColumn("cum_before", coalesce(sum(col("c")).over(w), lit(0L)))
  }

  /** Two-pass distributed prefix-sum variant for unbounded distinct-
    * value domains: distinct values map to ~[[PrefixRanges]] coarse
    * value ranges by pure integer arithmetic; per-range totals
    * prefix-sum in a small window; each range's offset broadcasts
    * back and the within-range cumulative window is partitioned BY
    * range. Ordering by value within value-ordered ranges makes the
    * arithmetic identical to [[histogram]]'s single global window
    * (spec-verified equal).
    *
    * The coarse key is computed on HALVED values: `hi - lo` and
    * `v - lo` wrap silently (non-ANSI Long arithmetic) when the
    * domain spans more than 2^63 (e.g. lo near Long.MinValue, hi near
    * Long.MaxValue), which would make the key non-monotonic in v.
    * `v DIV 2` is monotone nondecreasing and confines every
    * intermediate to [-2^62, 2^62], so `(v DIV 2 - lo DIV 2) DIV
    * halfstep` is overflow-free and monotone for the FULL bigint
    * domain, at the cost of a 2× coarser step resolution (irrelevant:
    * the key only has to be monotone and ≤ ~[[PrefixRanges]]-valued;
    * the final histogram never sees it).
    */
  def histogramPartitioned(df: DataFrame, value: Column, buckets: Int): DataFrame = {
    require(buckets >= 1)
    val counts = valueCounts(df, value)
    bucketize(cumPartitioned(counts), counts.agg(sum(col("c")).as("n")), buckets)
  }

  private[ops] def cumPartitioned(counts: DataFrame): DataFrame = {
    val mm = counts.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val ranged = counts.crossJoin(broadcast(mm))
      .withColumn("halfstep", expr(s"(hi DIV 2 - lo DIV 2) DIV $PrefixRanges + 1"))
      .withColumn("coarse", expr("(v DIV 2 - lo DIV 2) DIV halfstep"))

    val wOff = Window.orderBy(col("coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("coarse")).agg(sum(col("c")).as("cs"))
      .withColumn("offset", coalesce(sum(col("cs")).over(wOff), lit(0L)))
      .select(col("coarse"), col("offset"))

    val wIn = Window.partitionBy(col("coarse")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)

    ranged.join(broadcast(offsets), Seq("coarse"))
      .withColumn("cum_before",
        col("offset") + coalesce(sum(col("c")).over(wIn), lit(0L)))
  }

  /** Multi-column generalization of [[cumSingle]]: exclusive prefix
    * sums of every column in `sumCols` over the `v`-ordered histogram
    * (ascending or descending), emitted as `cum_before_<col>`. One
    * window, unpartitioned — for domains under the cutoff.
    */
  private[ops] def cumSingleMulti(counts: DataFrame, sumCols: Seq[String],
      asc: Boolean = true): DataFrame = {
    val w = Window.orderBy(if (asc) col("v").asc else col("v").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    sumCols.foldLeft(counts)((d, c) =>
      d.withColumn(s"cum_before_$c", coalesce(sum(col(c)).over(w), lit(0L))))
  }

  /** Multi-column generalization of [[cumPartitioned]] — the same
    * two-pass coarse-range device (see [[histogramPartitioned]] for
    * the overflow-free halved-value key), prefix-summing every column
    * in `sumCols` at once, ascending or descending. The coarse key is
    * monotone in `v`, so ordering coarse ranges and the within-range
    * window BOTH by the requested direction reproduces the global
    * total order exactly.
    */
  private[ops] def cumPartitionedMulti(counts: DataFrame, sumCols: Seq[String],
      asc: Boolean = true): DataFrame = {
    def dir(c: Column) = if (asc) c.asc else c.desc
    val mm = counts.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val ranged = counts.crossJoin(broadcast(mm))
      .withColumn("halfstep", expr(s"(hi DIV 2 - lo DIV 2) DIV $PrefixRanges + 1"))
      .withColumn("coarse", expr("(v DIV 2 - lo DIV 2) DIV halfstep"))

    val wOff = Window.orderBy(dir(col("coarse")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aggs = sumCols.map(c => sum(col(c)).as(s"__cs_$c"))
    val offsets = sumCols.foldLeft(
        ranged.groupBy(col("coarse")).agg(aggs.head, aggs.tail: _*)) {
      (d, c) => d.withColumn(s"__off_$c",
        coalesce(sum(col(s"__cs_$c")).over(wOff), lit(0L)))
    }.select(col("coarse") +: sumCols.map(c => col(s"__off_$c")): _*)

    val wIn = Window.partitionBy(col("coarse")).orderBy(dir(col("v")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCums = sumCols.foldLeft(ranged.join(broadcast(offsets), Seq("coarse"))) {
      (d, c) => d.withColumn(s"cum_before_$c",
        col(s"__off_$c") + coalesce(sum(col(c)).over(wIn), lit(0L)))
    }
    withCums.drop(Seq("lo", "hi", "halfstep", "coarse") ++
      sumCols.map(c => s"__off_$c"): _*)
  }

  /** The auto-strategy prefix-sum entry point (the C102/A40 policy,
    * shared by Conformal/RocCurve/DecisionStump/RankEval): persists
    * the (v, cols...) histogram — it feeds the window pass either way
    * — and picks the single small window under `distinctCutoff`
    * distinct values, the two-pass partitioned prefix above it (or
    * when `forcePartitioned`, the spec/debug hook). Both paths are
    * bit-identical; output adds `cum_before_<col>` per sum column.
    */
  private[ops] def cumAutoMulti(counts: DataFrame, sumCols: Seq[String],
      asc: Boolean = true, distinctCutoff: Long = AutoDistinctCutoff,
      forcePartitioned: Boolean = false): DataFrame =
    cumAutoMultiCounted(counts, sumCols, asc, distinctCutoff, forcePartitioned)._1

  /** [[cumAutoMulti]] that also returns the measured distinct count,
    * so a caller with a LATER histogram whose cardinality is bounded
    * by this one (e.g. C114's distinct-score pass, one row per
    * distinct feature value) can pick that pass's strategy via
    * [[cumMulti]] without a second eager measuring job.
    */
  private[ops] def cumAutoMultiCounted(counts: DataFrame, sumCols: Seq[String],
      asc: Boolean = true, distinctCutoff: Long = AutoDistinctCutoff,
      forcePartitioned: Boolean = false): (DataFrame, Long) = {
    val persisted = counts.sharedPersist() // idempotent through PlanCache
    val n = persisted.count()
    (cumMulti(persisted, sumCols, asc,
      usePartitioned = forcePartitioned || n > distinctCutoff), n)
  }

  /** Strategy-dispatched prefix sums when the caller already knows
    * which path to take — no measuring job; the histogram is still
    * shared-persisted (the partitioned path consumes it twice).
    */
  private[ops] def cumMulti(counts: DataFrame, sumCols: Seq[String],
      asc: Boolean, usePartitioned: Boolean): DataFrame = {
    val persisted = counts.sharedPersist()
    if (usePartitioned) cumPartitionedMulti(persisted, sumCols, asc)
    else cumSingleMulti(persisted, sumCols, asc)
  }

  /** Measured crossover between the strategies (docs/EQUIDEPTH.md,
    * `graft.EquiDepthBench` on sf10's 60M-row lineitem): the single
    * unpartitioned window wins up through ≥3.75M distinct values
    * (9.2 vs 12.8 s — the partitioned variant's 3 extra tiny shuffles
    * dominate), the partitioned prefix-sum wins from ≤14.7M distinct
    * (13.3 vs 19.1 s, widening to 2.4× at 45.7M as the one-partition
    * sort becomes the straggler). 8M is the bracket's log-midpoint.
    */
  final val AutoDistinctCutoff = 8000000L

  /** One public entry point that picks the window strategy from the
    * MEASURED distinct-value count: the (v, c) aggregate is persisted
    * (it feeds the window pass either way, so nothing extra is
    * computed — the count() action just materializes it one stage
    * early), and the cumulative pass runs single-window under
    * [[AutoDistinctCutoff]] distinct values, partitioned above. The
    * persisted intermediate is |distinct values| rows of two longs,
    * evicted by Spark's LRU cache once the histogram is consumed.
    */
  def histogramAuto(df: DataFrame, value: Column, buckets: Int,
      distinctCutoff: Long = AutoDistinctCutoff): DataFrame = {
    require(buckets >= 1)
    val counts = valueCounts(df, value)
      .sharedPersist()
    val nDistinct = counts.count()
    val cum = if (nDistinct <= distinctCutoff) cumSingle(counts) else cumPartitioned(counts)
    bucketize(cum, counts.agg(sum(col("c")).as("n")), buckets)
  }

  /** Shared tail: (v, c, cum_before) → per-bucket summary rows. */
  private def bucketize(cum: DataFrame, total: DataFrame, buckets: Int): DataFrame =
    cum
      .crossJoin(broadcast(total))
      .select(col("v"), col("c"),
        expr(s"(cum_before * $buckets) DIV n").as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_values"),
        min(col("v")).as("min_val"), max(col("v")).as("max_val"))

  /** DuckDB twin of [[histogram]] over `valueExpr` from `table`;
    * final relation is `edepth`.
    */
  def histogramSql(table: String, valueExpr: String, buckets: Int): String =
    s"""edc AS (SELECT CAST($valueExpr AS BIGINT) AS v, count(*) AS c
       |        FROM $table WHERE $valueExpr IS NOT NULL GROUP BY 1),
       |edcum AS (
       |  SELECT v, c,
       |    coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
       |    sum(c) OVER () AS n
       |  FROM edc),
       |edepth AS (
       |  -- cum_before and n are window-sum HUGEINTs in DuckDB; the
       |  -- floor-div inherits that, and the type-sensitive hash gate
       |  -- renders HUGEINT differently from Spark's BIGINT even at
       |  -- equal values (SURVEY §4) — cast the bucket id back down.
       |  SELECT CAST((cum_before * $buckets) // n AS BIGINT) AS bucket,
       |    CAST(sum(c) AS BIGINT) AS n_rows,
       |    CAST(count(*) AS BIGINT) AS n_values,
       |    min(v) AS min_val, max(v) AS max_val
       |  FROM edcum GROUP BY 1)""".stripMargin
}
