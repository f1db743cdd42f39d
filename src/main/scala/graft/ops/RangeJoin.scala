package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join without a nested-loop cross product.
  *
  * Spark plans a pure inequality join (`p.ts BETWEEN i.lo AND i.hi`
  * with no equality conjunct) as BroadcastNestedLoopJoin: every
  * (point, interval) pair is compared and one whole side must fit in
  * a broadcast — both fatal at 100 TB.
  *
  * This operator buckets the domain into fixed-width cells: each
  * interval is exploded to every cell it overlaps (`sequence`), each
  * point maps to exactly ONE cell, and the join becomes an EQUI-join
  * on the cell id followed by the exact containment filter. Because a
  * point lives in a single cell, each qualifying pair is emitted
  * exactly once — no post-join dedup. The shuffle is keyed on the
  * cell id, so both sides partition and AQE can handle skewed cells.
  *
  * Cell width trades interval duplication (too narrow → many cells
  * per interval) against candidate fan-in (too wide → many false
  * candidates per cell); pick it on the order of the median interval
  * width.
  */
object RangeJoin {

  /** Inner join of points to the intervals containing them
    * (inclusive on both ends). `pointPos`, `lo`, `hi` must be bigint
    * positions on a shared axis (e.g. unix micros); `cellWidth` is
    * the bucket width on that axis. Column names must be disjoint
    * across the two inputs.
    */
  def pointInInterval(points: DataFrame, pointPos: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      cellWidth: Long): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    val p = points.withColumn("__cell", cellOf(pointPos, cellWidth))
    val i = intervals.withColumn("__cell",
      explode(sequence(cellOf(lo, cellWidth), cellOf(hi, cellWidth))))
    p.join(i, "__cell")
      .filter(pointPos.between(lo, hi))
      .drop("__cell")
  }

  /** floor(pos / width) in exact integer arithmetic: pmod makes the
    * numerator an exact multiple, so the division is exact — no
    * double-rounding at cell boundaries (pos may be negative).
    */
  private def cellOf(pos: Column, width: Long): Column =
    ((pos - pmod(pos, lit(width))) / lit(width)).cast("bigint")
}
