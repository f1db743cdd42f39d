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

  /** Cumulative hash thresholds for a named split spec: `splits` is
    * (label, fraction) with fractions summing to ≤ 1; any remainder
    * of the hash space goes to the LAST label. Shared by the Spark
    * column and the SQL twin so both sides draw identical boundaries.
    */
  private[ops] def splitBounds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9)
    val cum = splits.scanLeft(BigDecimal(0)) { case (acc, (_, f)) => acc + BigDecimal(f) }.tail
    val bounds = splits.map(_._1).zip(cum.map(c => (c * BigDecimal(HashSpace)).toLong))
    bounds.init :+ (bounds.last._1 -> HashSpace) // last label absorbs rounding remainder
  }

  /** Deterministic disjoint-and-exhaustive dataset split (train /
    * valid / test …): the 60-bit content hash of `key` is bucketed by
    * cumulative fraction boundaries. A pure narrow expression — no
    * shuffle, no state; the same row lands in the same split on any
    * cluster, under any partitioning, and after corpus growth (new
    * rows never move old rows between splits, unlike row_number
    * striping). Disjointness/exhaustiveness hold by construction:
    * the boundaries partition [0, 2^60).
    */
  def assignSplit(key: Column, splits: Seq[(String, Double)]): Column = {
    val h = Dedup.md5Hash60(key.cast("string"))
    val bounds = splitBounds(splits)
    bounds.init.foldRight(lit(bounds.last._1): Column) { case ((label, hi), acc) =>
      when(h < lit(hi), lit(label)).otherwise(acc)
    }
  }

  /** DuckDB twin of [[assignSplit]] over the same boundaries. */
  def assignSplitSql(keyExpr: String, splits: Seq[(String, Double)]): String = {
    val h = s"('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 15))::BIGINT"
    val bounds = splitBounds(splits)
    val whens = bounds.init
      .map { case (label, hi) => s"WHEN $h < $hi THEN '$label'" }.mkString(" ")
    s"CASE $whens ELSE '${bounds.last._1}' END"
  }
}
