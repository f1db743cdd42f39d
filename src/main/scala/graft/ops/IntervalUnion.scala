package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval-union statistics — the sweep-line merge of
  * overlapping [start, end] intervals that answers "how much wall
  * clock does this key actually cover": service-span coverage per
  * GTFS route (when do trips overlap vs gap), user activity span
  * from event intervals, SLA coverage windows. The relational
  * equivalent of `merge overlapping intervals`, done without a UDF
  * or a driver loop.
  *
  * The device: order intervals per key by (start, end); an interval
  * starts a new ISLAND when its start exceeds the running max of all
  * previous ends (rows-preceding window). The island id is the
  * running sum of that flag; islands then collapse to
  * [min(start), max(end)]. Touching intervals (start == prev max
  * end) merge — closed-interval semantics, documented. Outputs are
  * order-invariant under (start, end) ties: the running max and the
  * island flags are identical however equal rows are ordered, so no
  * synthetic tiebreak column is needed for determinism.
  *
  * Scale shape: two window passes + one groupBy, ALL partitioned by
  * the key — per-key sequential work parallelizes across keys, the
  * only shuffle is the key hash; no global window, no driver state.
  * Skew is bounded by the largest per-key interval count.
  */
object IntervalUnion {

  /** @param intervals (key, s, e) — int64 interval bounds, s <= e
    * @return per key: (key, n_intervals, n_islands, union_len,
    *         max_gap) where union_len = total covered length,
    *         max_gap = largest uncovered gap BETWEEN islands (0 for
    *         a single island)
    */
  def unionStats(intervals: DataFrame, key: Column, s: Column, e: Column): DataFrame = {
    val base = intervals.select(key.as("key"),
      s.cast("bigint").as("s"), e.cast("bigint").as("e"))
    val w = Window.partitionBy(col("key")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = base
      .withColumn("pm", prevMax)
      .withColumn("new_island",
        when(col("pm").isNull || col("s") > col("pm"), 1L).otherwise(0L))
      .withColumn("gap",
        when(col("pm").isNotNull && col("s") > col("pm"), col("s") - col("pm")))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy(col("key"), col("island"))
      .agg(count(lit(1)).as("n_iv"), min(col("s")).as("is_"),
        max(col("e")).as("ie"), max(col("gap")).as("island_gap"))
      .groupBy(col("key"))
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("ie") - col("is_")).as("union_len"),
        coalesce(max(col("island_gap")), lit(0L)).as("max_gap"))
  }

  /** DuckDB twin over a CTE `iv(key, s, e)`; emits the WITH tail +
    * final SELECT (unordered — callers append ORDER BY).
    */
  def unionStatsSqlTail: String =
    """flg AS (SELECT key, s, e,
      |    max(e) OVER (PARTITION BY key ORDER BY s, e
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM iv),
      |isl AS (SELECT key, s, e,
      |    CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS new_island,
      |    CASE WHEN pm IS NOT NULL AND s > pm THEN s - pm END AS gap
      |  FROM flg),
      |num AS (SELECT key, s, e, gap,
      |    sum(new_island) OVER (PARTITION BY key ORDER BY s, e
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM isl),
      |grp AS (SELECT key, island, count(*) AS n_iv, min(s) AS is_, max(e) AS ie,
      |    max(gap) AS island_gap
      |  FROM num GROUP BY key, island)
      |SELECT key, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
      |  CAST(count(*) AS BIGINT) AS n_islands,
      |  CAST(sum(ie - is_) AS BIGINT) AS union_len,
      |  CAST(coalesce(max(island_gap), 0) AS BIGINT) AS max_gap
      |FROM grp GROUP BY key""".stripMargin
}
