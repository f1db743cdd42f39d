package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-anonymity audit over quasi-identifier combinations — the
  * re-identification check that complements the PII surface (C32
  * pattern audit, C72 staged redaction): a row whose quasi-identifier
  * combination (language, source, length bucket, ...) is shared by
  * fewer than k rows is re-identifiable even after direct
  * identifiers are scrubbed. The audit reports every equivalence
  * class with its size, at-risk flag, and — for l-diversity — the
  * number of distinct sensitive values inside the class.
  *
  * Scale shape: one hash-aggregate on the quasi-identifier tuple
  * (map-side partial counts; the sensitive-value distinct rides the
  * same shuffle as a two-level agg). No joins, no windows; the
  * output is one row per equivalence class, not per document.
  */
object Privacy {

  /** Equivalence-class audit.
    *
    * @param quasiIds  named quasi-identifier columns (pre-bucketed)
    * @param sensitive the sensitive attribute for l-diversity
    * @param k         anonymity threshold
    * @return one row per QI combination: the QI columns +
    *         (class_size, n_sensitive, at_risk) where at_risk = 1
    *         iff class_size < k.
    */
  def kAnonymity(
      df: DataFrame,
      quasiIds: Seq[(String, Column)],
      sensitive: Column,
      k: Int): DataFrame = {
    require(quasiIds.nonEmpty && k >= 1)
    val qi = quasiIds.map { case (n, c) => c.as(n) }
    df.select(qi :+ sensitive.as("__sens"): _*)
      .groupBy(quasiIds.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col("__sens")).as("n_sensitive"))
      .withColumn("at_risk",
        when(col("class_size") < k, 1).otherwise(0).cast("int"))
  }

  /** Corpus-level summary: classes, at-risk classes, at-risk rows,
    * and the smallest class size (the corpus's effective k).
    */
  def kAnonymitySummary(
      df: DataFrame,
      quasiIds: Seq[(String, Column)],
      sensitive: Column,
      k: Int): DataFrame =
    kAnonymity(df, quasiIds, sensitive, k).agg(
      count(lit(1)).as("n_classes"),
      sum(col("at_risk")).cast("bigint").as("n_risk_classes"),
      sum(when(col("at_risk") === 1, col("class_size")).otherwise(0L))
        .cast("bigint").as("n_risk_rows"),
      min(col("class_size")).as("effective_k"))
}
