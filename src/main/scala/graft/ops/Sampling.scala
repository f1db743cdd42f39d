package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `rand()`
  * sampling is irreproducible across runs/partitionings and
  * engines; these operators derive the sampling decision from a
  * content hash, so the same corpus always yields the same sample —
  * on any cluster, in any engine (the DuckDB oracles reproduce them
  * exactly), and stably under re-partitioning.
  */
object Sampling {

  /** 2^60 — the hash space of [[Dedup.md5Hash60]]. */
  final val HashSpace = 1L << 60

  /** Keep rows whose 60-bit md5 of `key` falls in the first
    * `fraction` of the hash space. A narrow filter — no shuffle, no
    * state (the predicate is computed, so it does not push to the
    * scan, but it also never moves a row); proportional sampling
    * independent of row order or partitioning.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    val threshold = (BigDecimal(fraction) * BigDecimal(HashSpace)).toLong
    df.filter(Dedup.md5Hash60(key.cast("string")) < lit(threshold))
  }

  /** Exactly `nPerGroup` rows per group (fewer if the group is
    * smaller), chosen by hash order with the key as tiebreak — a
    * deterministic stratified sample. One shuffle on the group key;
    * rank is computed per group, never globally.
    */
  def stratifiedSample(df: DataFrame, group: Column, key: Column, nPerGroup: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group)
      .orderBy(Dedup.md5Hash60(key.cast("string")), key)
    df.withColumn("graft_rank", row_number().over(w))
      .filter(col("graft_rank") <= nPerGroup)
      .drop("graft_rank")
  }

  /** Weighted mixture sampling across sources: each source keeps its
    * own hash-fraction. Missing sources in `weights` are dropped.
    * Deterministic like [[hashSample]]; at scale this is the
    * "mix 30% web + 60% books + 10% code" step of corpus assembly.
    */
  def mixtureSample(
      df: DataFrame,
      source: Column,
      key: Column,
      weights: Map[String, Double]): DataFrame = {
    val thresholdBySource = weights.map { case (s, f) =>
      s -> (BigDecimal(f) * BigDecimal(HashSpace)).toLong
    }
    val thresholdCol = thresholdBySource.foldLeft(lit(-1L)) { case (acc, (s, t)) =>
      when(source === s, lit(t)).otherwise(acc)
    }
    df.filter(Dedup.md5Hash60(key.cast("string")) < thresholdCol)
  }
}
