package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Decision-stump training — the optimal single-threshold split of
  * an integer feature against a boolean label, by exact weighted
  * Gini impurity. The simplest trained model there is (a 1-level
  * tree), and the working core of gradient-boosting split finding:
  * proving THIS split search exact and distributed is the building
  * block a tree ensemble repeats per feature per node. Also the
  * principled way to pick a hard cutoff for a C41-style quality
  * score (where C111's ROC shows the trade, the stump picks the
  * impurity-optimal point).
  *
  * Split search runs over the (feature value) histogram, not rows —
  * the C111/C87 argument: one partial-agg groupBy, then cumulative
  * prefix sums over <= |distinct values| rows. The prefix strategy is
  * picked from the MEASURED distinct count (the C102/A40 auto policy
  * via [[EquiDepth.cumAutoMulti]]): one small window under the
  * cutoff, the two-pass partitioned prefix above it — so an
  * unbucketed wide-domain feature never runs a single-partition
  * global sort.
  *
  * Determinism: candidate thresholds are scored by the exact
  * integer form of N * weightedGini(t):
  *
  *   score(t) = (L^2 - lp^2 - ln^2)/L + (R^2 - rp^2 - rn^2)/R
  *
  * over the left/right positive/negative counts, floor-milli'd from
  * DECIMAL(38,0) arithmetic (L^2 * R passes int64 around 2 M rows)
  * into an integer BEFORE ranking — (score asc, threshold asc) is a
  * total order no float can perturb.
  */
object DecisionStump {

  /** Per-threshold split scores: one row per candidate split
    * "feature <= t" (every distinct value except the maximum, which
    * leaves an empty right side).
    *
    * @return (threshold, l_pos, l_neg, r_pos, r_neg, score_milli,
    *         rk) with rk = 1 the optimal stump
    */
  def splitScores(df: DataFrame, feature: Column, label: Column,
      distinctCutoff: Long = EquiDepth.AutoDistinctCutoff,
      forcePartitioned: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df
      .select(feature.cast("bigint").as("v"), label.cast("boolean").as("y"))
      .groupBy(col("v"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("p"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("n"))

    val totals = hist.agg(sum(col("p")).as("tot_p"), sum(col("n")).as("tot_n"))

    val dec = "CAST(%s AS DECIMAL(38,0))"
    def sq(c: String) = s"(${dec.format(c)} * ${dec.format(c)})"
    // greatest(divisor, 1) is inert — the rt > 0 filter guarantees
    // lt*rt >= 1 on every surviving row — but keeps ANSI mode happy
    // when Catalyst infers isnotnull(score_milli) from the rank join
    // and evaluates the expression on the filtered-out rt = 0 row
    val scoreExpr = expr(
      s"CAST((1000 * ((${sq("lt")} - ${sq("lp")} - ${sq("ln")}) * rt" +
        s" + (${sq("rt")} - ${sq("rp")} - ${sq("rn")}) * lt))" +
        s" DIV greatest(${dec.format("lt")} * ${dec.format("rt")}," +
        s" CAST(1 AS DECIMAL(38,0))) AS BIGINT)")

    // inclusive left-side counts via the shared auto-strategy prefix
    // device (C102/A40): one small window under the cutoff, the
    // two-pass partitioned prefix above — a wide-domain feature
    // (e.g. a raw milli-score at 100× data) never funnels the whole
    // histogram through a single-partition sort.
    val (histCum, nDistinctFeatures) = EquiDepth
      .cumAutoMultiCounted(hist, Seq("p", "n"), asc = true, distinctCutoff, forcePartitioned)
    val scored = histCum
      .withColumn("lp", col("cum_before_p") + col("p"))
      .withColumn("ln", col("cum_before_n") + col("n"))
      .crossJoin(broadcast(totals))
      .withColumn("rp", col("tot_p") - col("lp"))
      .withColumn("rn", col("tot_n") - col("ln"))
      .withColumn("lt", col("lp") + col("ln"))
      .withColumn("rt", col("rp") + col("rn"))
      .filter(col("rt") > 0L) // max value: no right side, not a split
      .withColumn("score_milli", scoreExpr)
      .withColumnRenamed("v", "t")

    // rk = global (score_milli, t) rank, decomposed so no window is
    // ever global: an exclusive prefix over the distinct-SCORE
    // histogram (keyed on score_milli) plus a row_number PARTITIONED
    // by score_milli breaking ties on t — partition sizes are
    // tie-group sizes, never the histogram. The strategy reuses the
    // feature pass's measurement (|distinct scores| <= |distinct
    // feature values|: each surviving threshold row yields one score
    // row) instead of a second eager measuring job that would
    // materialize the whole scoring pipeline at plan-build time.
    val perScoreCnt = scored.groupBy(col("score_milli")).agg(count(lit(1)).as("c"))
    val scoreCum = EquiDepth
      .cumMulti(perScoreCnt.withColumnRenamed("score_milli", "v"), Seq("c"),
        asc = true,
        usePartitioned = forcePartitioned || nDistinctFeatures > distinctCutoff)
      .select(col("v").as("score_milli"), col("cum_before_c"))
    val wTie = Window.partitionBy(col("score_milli")).orderBy(col("t"))
    scored
      .join(scoreCum, Seq("score_milli"))
      .withColumn("rk",
        (col("cum_before_c") + row_number().over(wTie)).cast("bigint"))
      .select(col("t").as("threshold"), col("lp").as("l_pos"),
        col("ln").as("l_neg"), col("rp").as("r_pos"),
        col("rn").as("r_neg"), col("score_milli"), col("rk"))
  }

  /** The optimal stump (rk = 1 of [[splitScores]]) with its
    * majority-vote leaf classes (ties -> positive).
    */
  def fit(df: DataFrame, feature: Column, label: Column): DataFrame =
    splitScores(df, feature, label)
      .filter(col("rk") === 1L)
      .withColumn("left_class", col("l_pos") >= col("l_neg"))
      .withColumn("right_class", col("r_pos") >= col("r_neg"))
      .drop("rk")
}
