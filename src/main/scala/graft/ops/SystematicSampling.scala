package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Systematic probability-proportional-to-size (PPS) sampling: pick
  * ~`k` documents with inclusion probability proportional to an
  * integer weight (token count, byte size), the classic survey-
  * sampling design re-expressed with exact bigint arithmetic so the
  * DuckDB oracle reproduces it bit-for-bit.
  *
  * Design: rows are laid on a line in hash-randomized order (the
  * 60-bit md5 of the id — "randomized systematic sampling"), each
  * covering a segment of length = its weight. `k` equally spaced
  * ticks are dropped at the odd multiples of `total/(2k)` (the
  * deterministic midpoint variant — no RNG anywhere); a row is
  * selected once per tick inside its segment, so a row with weight
  * ≥ total/k is ALWAYS selected (possibly with multiplicity — the
  * standard behavior for oversized units, reported in `n_sel`).
  *
  * All tick arithmetic is scaled by 2k and stays integral:
  * ticks(x) = |{odd j ≥ 1 : j·total < 2k·x}| counts ticks strictly
  * before prefix position x, and n_sel = ticks(cum+w) − ticks(cum);
  * Σ n_sel == k exactly. Requires 2·k·total < 2^63 (9.2e18 — e.g. a
  * 4.6-trillion-token corpus at k = 1M); beyond that, pre-aggregate
  * weights to coarser units or shard the tick space.
  *
  * Scale shape: the prefix sum over the hash order never funnels
  * through one partition — the hash key is uniform in [0, 2^60), so
  * its top bits are a PERFECTLY balanced coarse range key (unlike
  * [[Selection.tokenBudget]], no min/max pass is needed): per-range
  * totals prefix-sum in a [[HashRanges]]-row window, offsets
  * broadcast back, the within-range running sum is range-partitioned.
  * The tick test itself is a narrow per-row expression. Integer
  * division is spelled `DIV` throughout — `Column./` is DOUBLE
  * division and silently loses bits past 2^53.
  */
object SystematicSampling {

  /** Coarse hash-range count for the distributed prefix sum. */
  final val HashRanges = 256

  private val RangeWidth: Long = Sampling.HashSpace / HashRanges

  /** Sample ~`k` rows PPS by `weight` (positive bigint).
    *
    * @return (doc_id, weight, cum_before, n_sel) for selected rows
    *         (n_sel ≥ 1 tick landed in the row's segment).
    */
  def sample(df: DataFrame, id: Column, weight: Column, k: Long): DataFrame = {
    require(k >= 1)
    val rows = df.select(id.cast("bigint").as("doc_id"),
        weight.cast("bigint").as("w"))
      .withColumn("hkey", Dedup.md5Hash60(col("doc_id").cast("string")))
      .withColumn("coarse", expr(s"hkey DIV ${RangeWidth}L"))

    val wOff = Window.orderBy(col("coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy(col("coarse")).agg(sum(col("w")).as("cs"))
      .withColumn("offset", coalesce(sum(col("cs")).over(wOff), lit(0L)))
      .select(col("coarse"), col("offset"))

    // equal hash keys share a coarse key (it is a function of the
    // hash alone), so (hkey, doc_id) inside each range reproduces
    // the global order exactly
    val wIn = Window.partitionBy(col("coarse"))
      .orderBy(col("hkey"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)

    val total = rows.agg(sum(col("w")).as("total"))
    rows.join(broadcast(offsets), Seq("coarse"))
      .withColumn("cum_before",
        col("offset") + coalesce(sum(col("w")).over(wIn), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("t_end", ticksBefore(s"(cum_before + w)", k))
      .withColumn("t_start", ticksBefore("cum_before", k))
      .withColumn("n_sel", col("t_end") - col("t_start"))
      .filter(col("n_sel") > 0)
      .select(col("doc_id"), col("w").as("weight"),
        col("cum_before"), col("n_sel"))
  }

  /** |{odd j ≥ 1 : j·total < 2k·x}| — ticks strictly before prefix
    * position x, exact integer arithmetic over columns `x`/`total`.
    */
  private def ticksBefore(x: String, k: Long): Column =
    expr(s"((CASE WHEN $x <= 0 THEN 0L " +
      s"ELSE (2L * ${k}L * $x - 1L) DIV total END) + 1L) DIV 2L")

  /** DuckDB twin of the tick count (`//` = integer division). */
  def ticksBeforeSql(x: String, k: Long, total: String): String =
    s"((CASE WHEN ($x) <= 0 THEN 0 ELSE (2 * $k * ($x) - 1) // ($total) END) + 1) // 2"
}
