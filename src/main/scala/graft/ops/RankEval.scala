package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed AUC — the threshold-free counterpart of C100's
  * fixed-threshold confusion metrics (a filter's operating threshold
  * is chosen AFTER training, from precisely this ranking quality;
  * comparing two candidate quality models at threshold 0 tells you
  * which crosses zero better, not which ranks better).
  *
  * AUC is computed as the Mann-Whitney U statistic with midrank tie
  * handling (ties get 0.5 credit — the textbook estimator), in EXACT
  * integer arithmetic: margins are integers (C99), so ranks are
  * integers once scaled by 2 (`mr2 = 2·cum_before + c + 1` is the
  * doubled midrank of a tie-group of size c), `2U = Σ_pos mr2 −
  * 2·Σranks(1..P)` stays integral, and `auc_milli = ⌊1000·2U /
  * (2PN)⌋` divides identical integers on every engine. No float
  * enters until never.
  *
  * Scale shape (the A40 equi-depth argument): the global order runs
  * over the DISTINCT-MARGIN histogram, not rows — one partial-agg
  * shuffle collapses the corpus to (margin, c, p) rows first. The
  * prefix sum over that histogram picks its strategy from the
  * MEASURED distinct count (the A40 `histogramAuto` policy and
  * docs/EQUIDEPTH.md crossover): one small window below the cutoff,
  * A40's two-pass coarse-range partitioned prefix sum above it — so
  * the 100×-safe path is the DEFAULT for wide-domain margins, not an
  * opt-in flag. The grouped variant partitions every window by
  * group, so nothing is ever single-partition there.
  */
object RankEval {

  /** Global AUC of `margin` against binary `label` (+1 positive,
    * -1 negative). One row: (p, n, u2, auc_milli); u2 = 2·U exactly.
    * Degenerate cases (no positives or no negatives) → auc_milli -1.
    *
    * The prefix-sum strategy over the distinct-margin histogram is
    * picked from the MEASURED distinct count, the A40
    * `histogramAuto` policy: the (v, c, p) aggregate is persisted
    * (it feeds the window pass either way — the count() just
    * materializes it a stage early), and the cumulative pass runs as
    * ONE small window under `distinctCutoff` distinct margins, or as
    * A40's two-pass coarse-range partitioned prefix sum above it —
    * so a huge-domain margin column (e.g. raw 64-bit scores) never
    * funnels through a single-partition global sort by default.
    * `partitionedPrefix = true` forces the partitioned path
    * regardless (spec/debug hook); both paths are bit-identical.
    */
  def aucMilli(scored: DataFrame, margin: Column, label: Column,
      partitionedPrefix: Boolean = false,
      distinctCutoff: Long = EquiDepth.AutoDistinctCutoff): DataFrame = {
    val counts = scored
      .select(margin.cast("bigint").as("v"),
        when(label === 1, 1L).otherwise(0L).as("ispos"))
      .filter(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(count(lit(1)).as("c"), sum(col("ispos")).as("p"))
    // the shared auto-strategy device (one implementation for the
    // whole C102/C111/C114/C117/C118 family — RankEval used to carry
    // its own copy of this policy); the p column rides through the
    // prefix pass, so no join-back is needed
    val cum = EquiDepth
      .cumAutoMulti(counts, Seq("c"), asc = true, distinctCutoff, partitionedPrefix)
      .withColumnRenamed("cum_before_c", "cum_before")
    finish(cum)
  }

  /** Per-group AUC: (grp, p, n, u2, auc_milli) — windows partitioned
    * by group, never global.
    */
  def aucMilliByGroup(scored: DataFrame, group: Column, margin: Column,
      label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = scored
      .select(group.as("grp"), margin.cast("bigint").as("v"),
        when(label === 1, 1L).otherwise(0L).as("ispos"))
      .filter(col("v").isNotNull)
      .groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("c"), sum(col("ispos")).as("p"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = counts.withColumn("cum_before", coalesce(sum(col("c")).over(w), lit(0L)))
    finish(cum, Seq(col("grp")))
  }

  private def finish(cum: DataFrame, keys: Seq[Column] = Seq.empty): DataFrame = {
    // doubled midrank of the tie group, weighted by its positives
    val agg = cum
      .withColumn("mr2", lit(2L) * col("cum_before") + col("c") + 1L)
      .groupBy(keys: _*)
      .agg(
        sum(col("p")).as("p"),
        (sum(col("c")) - sum(col("p"))).as("n"),
        sum(col("p") * col("mr2")).as("sum_pos_mr2"))
    // u2 ≥ 0 and the divisor > 0, so `div` (integer division, exact
    // on longs — never the double `/`) equals floor and matches
    // DuckDB's `//` bit-for-bit. Long-exact while u2·1000 < 2^63,
    // i.e. P·N < 4.6e15 (~68M positives × 68M negatives); past that,
    // AUC runs on a sampled eval set — the C94 argument: this is the
    // metric, not the serving path.
    agg
      .withColumn("u2", col("sum_pos_mr2") - col("p") * (col("p") + 1L))
      .withColumn("auc_milli",
        when(col("p") === 0L || col("n") === 0L, lit(-1L))
          .otherwise(expr("(u2 * 1000L) div (2L * p * n)")))
      .drop("sum_pos_mr2")
  }

  /** DuckDB twin of [[aucMilli]] / [[aucMilliByGroup]] over a
    * relation exposing (margin, y) — identical integer arithmetic;
    * pass group columns for the per-group variant.
    */
  def aucSql(from: String, groupCols: Seq[String] = Seq.empty): String = {
    val g = groupCols.mkString(", ")
    val gSel = if (groupCols.isEmpty) "" else s"$g, "
    val gBy = if (groupCols.isEmpty) "" else s"GROUP BY $g"
    val gPart = if (groupCols.isEmpty) "" else s"PARTITION BY $g"
    val gOrd = if (groupCols.isEmpty) "" else s"$g,"
    s"""SELECT ${gSel}p, n, u2,
       |  CASE WHEN p = 0 OR n = 0 THEN -1
       |       ELSE (u2 * 1000) // (2 * p * n) END AS auc_milli
       |FROM (
       |  SELECT ${gSel}p, n, sum_pos_mr2 - p * (p + 1) AS u2 FROM (
       |    SELECT ${gSel}
       |      CAST(SUM(p) AS BIGINT) AS p,
       |      CAST(SUM(c) - SUM(p) AS BIGINT) AS n,
       |      CAST(SUM(p * (2 * cum_before + c + 1)) AS BIGINT) AS sum_pos_mr2
       |    FROM (
       |      SELECT ${gSel}v, c, p,
       |        CAST(COALESCE(SUM(c) OVER ($gPart ORDER BY v
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |      FROM (
       |        SELECT ${gSel}margin AS v,
       |          CAST(count(*) AS BIGINT) AS c,
       |          CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p
       |        FROM $from GROUP BY ${gOrd} margin))
       |    $gBy))
       |ORDER BY ${if (groupCols.isEmpty) "p" else g}""".stripMargin
  }

  /** Decile lift / gains table (C118) — the campaign-analysis view of
    * a ranker: split the population into `k` equal-count score bands
    * (best margins first), and per band report the positive rate,
    * cumulative capture share, and lift vs the base rate. Where
    * C111's ROC sweeps thresholds, the gains table answers "how much
    * of the signal do the top-N% hold" — the budget question a
    * selection pipeline (C60) actually asks.
    *
    * Banding is the exact C87 histogram-NTILE device on -margin
    * (never a per-row global sort); band metrics are integer counts;
    * rates/lift are floor-milli integers, cumulative over k rows.
    */
  def liftTable(scored: DataFrame, id: Column, margin: Column, label: Column,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ntileGlobal, not ntileByGroup(lit(1), ...): the constant group
    // would single-partition the histogram windows exactly when the
    // margin domain goes near-distinct (the sf10 q_lift hazard) —
    // the global variant rides the auto-strategy prefix device.
    val tiles = PerplexityBuckets.ntileGlobal(
      scored.select(id.cast("bigint").as("__id"),
        (-margin).cast("bigint").as("__negm")),
      col("__negm"), col("__id"), k)
    val withY = tiles.join(
      scored.select(id.cast("bigint").as("id"),
        when(label.cast("boolean"), 1L).otherwise(0L).as("__y")),
      Seq("id"))
    val bands = withY.groupBy(col("tile").as("band"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val wCum = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bands
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
      .withColumn("tot_n", sum(col("n")).over(wAll))
      .select(col("band"), col("n"), col("n_pos"),
        expr("(1000 * n_pos) DIV n").as("pos_milli"),
        expr("CASE WHEN tot_pos = 0 THEN -1 ELSE (1000 * cum_pos) DIV tot_pos END")
          .as("capture_milli"),
        expr("CASE WHEN tot_pos = 0 THEN -1 ELSE (1000 * n_pos * tot_n) DIV (n * tot_pos) END")
          .as("lift_milli"))
  }

  /** DuckDB twin of [[liftTable]] over a relation exposing
    * (doc_id, margin, y) — DuckDB's builtin ntile over the same
    * total order produces identical bands (the C87 parity argument).
    */
  def liftSql(from: String, k: Int = 10): String =
    s"""SELECT band, n, n_pos,
       |  (1000 * n_pos) // n AS pos_milli,
       |  CASE WHEN sum(n_pos) OVER () = 0 THEN -1
       |       ELSE CAST((1000 * sum(n_pos) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING))
       |            // (sum(n_pos) OVER ()) AS BIGINT) END AS capture_milli,
       |  CASE WHEN sum(n_pos) OVER () = 0 THEN -1
       |       ELSE CAST((1000 * n_pos * (sum(n) OVER ())) // (n * (sum(n_pos) OVER ())) AS BIGINT)
       |       END AS lift_milli
       |FROM (
       |  SELECT band, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
       |  FROM (
       |    SELECT CAST(ntile($k) OVER (ORDER BY -margin, doc_id) AS BIGINT) AS band, y
       |    FROM $from)
       |  GROUP BY band)
       |ORDER BY band""".stripMargin
}
