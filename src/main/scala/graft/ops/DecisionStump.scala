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
  * windows over <= |distinct values| rows, bounded by the caller's
  * feature granularity.
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
  def splitScores(df: DataFrame, feature: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df
      .select(feature.cast("bigint").as("t"), label.cast("boolean").as("y"))
      .groupBy(col("t"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("p"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("n"))

    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = hist.agg(sum(col("p")).as("tot_p"), sum(col("n")).as("tot_n"))

    val dec = "CAST(%s AS DECIMAL(38,0))"
    def sq(c: String) = s"(${dec.format(c)} * ${dec.format(c)})"
    val scoreExpr = expr(
      s"CAST((1000 * ((${sq("lt")} - ${sq("lp")} - ${sq("ln")}) * rt" +
        s" + (${sq("rt")} - ${sq("rp")} - ${sq("rn")}) * lt))" +
        s" DIV (${dec.format("lt")} * ${dec.format("rt")}) AS BIGINT)")

    val scored = hist
      .withColumn("lp", sum(col("p")).over(w))
      .withColumn("ln", sum(col("n")).over(w))
      .crossJoin(broadcast(totals))
      .withColumn("rp", col("tot_p") - col("lp"))
      .withColumn("rn", col("tot_n") - col("ln"))
      .withColumn("lt", col("lp") + col("ln"))
      .withColumn("rt", col("rp") + col("rn"))
      .filter(col("rt") > 0L) // max value: no right side, not a split
      .withColumn("score_milli", scoreExpr)

    val wRank = Window.orderBy(col("score_milli"), col("t"))
    scored
      .withColumn("rk", row_number().over(wRank).cast("bigint"))
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
