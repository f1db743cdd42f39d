package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout for multi-dimensional scan
  * pruning.
  *
  * Sorting 100 TB by one column clusters that column only: a filter
  * on any other dimension reads every file. Interleaving the bits of
  * two (or more) bounded dimension keys produces a single sort key
  * whose contiguous ranges are small hyper-rectangles — after
  * range-partitioning + within-partition sorting on the z-value, a
  * box predicate on ANY of the interleaved dimensions touches a
  * small, contiguous subset of files/row-groups, and parquet min/max
  * stats prune the rest.
  *
  * The z-value is a pure integer expression (shift/mask/or) — it
  * stays inside whole-stage codegen and is reproducible in any
  * engine, so layouts written here are portable facts about the data.
  */
object ZOrder {

  /** 2-D Morton code: interleaves the low `bits` bits of x (even
    * positions) and y (odd positions). Inputs are masked to `bits`
    * bits first, so negative or oversized values wrap rather than
    * corrupt high bits.
    */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val xm = x.cast("bigint").bitwiseAND(lit(mask))
    val ym = y.cast("bigint").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB twin of [[zValue2]] (same shift/mask arithmetic).
    * Single-line on purpose: callers embed it in stripMargin SQL,
    * which would eat a leading `|` continuation.
    */
  def zValue2Sql(x: String, y: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    val xm = s"(CAST($x AS BIGINT) & $mask)"
    val ym = s"(CAST($y AS BIGINT) & $mask)"
    (0 until bits).map { i =>
      s"((($xm >> $i) & 1) << ${2 * i}) | ((($ym >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Write `df` parquet z-clustered on `z` into ~`numFiles` files:
    * range-partition on the z-value (contiguous z-ranges per file),
    * sort within each partition (monotone z within the file, so
    * parquet row-group min/max stats are tight). zstd by default —
    * clustered data compresses better (similar rows adjacent) and
    * zstd decodes faster per byte than the snappy default at 100 TB
    * scan volumes.
    */
  def writeZOrdered(df: DataFrame, z: Column, path: String, numFiles: Int,
      codec: String = "zstd"): Unit =
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").option("compression", codec).parquet(path)
}
