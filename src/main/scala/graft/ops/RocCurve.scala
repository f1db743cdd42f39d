package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ROC / precision-recall curve points — the threshold-sweep view of
  * a scorer's quality that a single AUC number (C102) cannot give:
  * which cutoff buys which TPR/FPR trade is what a filtering
  * pipeline actually tunes (e.g. "keep documents the quality scorer
  * ranks above t" picks t off this curve).
  *
  * One point per distinct INTEGER score, descending — callers with a
  * continuous score bucket it first (floor/fixed-point), which is
  * also what bounds the curve size independently of the row count.
  *
  * Scale shape: the heavy step is a partial-aggregated groupBy on
  * the score (counts only); the cumulative sweep then runs over at
  * most |distinct scores| rows — bounded by the caller's score
  * granularity, NOT the data — so the unpartitioned window is over
  * a provably small set (the same justification as C87's histogram
  * device). Totals ride along as a one-row broadcast.
  *
  * Determinism: counts are integers; tpr/fpr/precision are single
  * IEEE divisions of integers rounded 4dp — engine-portable.
  */
object RocCurve {

  /** Curve points for predicting `label` by `score >= t`, one row
    * per distinct score t descending.
    *
    * @param score integral-valued column (bucket floats first)
    * @param label boolean (or 0/1) column
    * @return (threshold, n_pos, n_neg, cum_tp, cum_fp, tpr, fpr,
    *         precision) ordered by threshold desc
    */
  def points(df: DataFrame, score: Column, label: Column,
      distinctCutoff: Long = EquiDepth.AutoDistinctCutoff,
      forcePartitioned: Boolean = false): DataFrame = {
    val perScore = df
      .select(score.cast("bigint").as("v"),
        label.cast("boolean").as("y"))
      .groupBy(col("v"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("n_neg"))

    val totals = perScore.agg(sum(col("n_pos")).as("tot_pos"),
      sum(col("n_neg")).as("tot_neg"))

    // Descending cumulative TP/FP over the distinct-score histogram
    // via the shared auto-strategy prefix device (C102/A40): the
    // "provably small set" justification only holds when callers
    // bucket continuous scores — when they don't (raw milli-scores at
    // 100× data), the measured distinct count now flips to the
    // two-pass partitioned prefix instead of funneling one partition.
    //
    // Degenerate inputs (no positives / no negatives) get the same
    // -1.0 sentinel convention as liftTable's capture/lift columns —
    // never a NaN/Infinity from a 0-total division. precision's
    // denominator is always >= 1 (every threshold row exists because
    // at least one input row carried it).
    EquiDepth.cumAutoMulti(perScore, Seq("n_pos", "n_neg"), asc = false,
        distinctCutoff, forcePartitioned)
      .withColumn("cum_tp", col("cum_before_n_pos") + col("n_pos"))
      .withColumn("cum_fp", col("cum_before_n_neg") + col("n_neg"))
      .withColumnRenamed("v", "threshold")
      .crossJoin(broadcast(totals))
      .select(col("threshold"), col("n_pos"), col("n_neg"),
        col("cum_tp"), col("cum_fp"),
        when(col("tot_pos") === 0L, lit(-1.0))
          .otherwise(round(col("cum_tp").cast("double") / col("tot_pos"), 4)).as("tpr"),
        when(col("tot_neg") === 0L, lit(-1.0))
          .otherwise(round(col("cum_fp").cast("double") / col("tot_neg"), 4)).as("fpr"),
        round(col("cum_tp").cast("double") / (col("cum_tp") + col("cum_fp")), 4)
          .as("precision"))
  }
}
