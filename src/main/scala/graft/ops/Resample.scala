package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling to a regular grid with forward fill —
  * "the value as of every aligned step" per key.
  *
  * Scale shape: the observation stream is never range-probed. The
  * grid is generated per key from that key's own (min, max) bounds
  * (one small aggregate + a `sequence` explode — grid rows, not data
  * rows), and the fill is the [[AsOfJoin]] composition: union + one
  * keyed shuffle + a running last(ignoreNulls) window. Total cost is
  * one shuffle over observations + grid, linear within each key.
  *
  * Same-instant observations are collapsed deterministically
  * (max_by on the tie-break column) BEFORE the fill, so the result
  * is engine-reproducible.
  */
object Resample {

  /** Per-key regular grid at `stepUs` alignment (slots are multiples
    * of stepUs between each key's first and last observation),
    * forward-filled. Returns (key, slot_us, value). Keys whose span
    * contains no aligned slot are absent (matches
    * generate_series(ceil, floor) semantics).
    */
  def resampleFfill(df: DataFrame, key: String, tsUs: String, value: String,
      tieBreak: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    def floorDiv(c: Column): Column =
      ((c - pmod(c, lit(stepUs))) / stepUs).cast("bigint")

    val obs = df.groupBy(col(key), col(tsUs).as("obs_us"))
      .agg(max_by(col(value), col(tieBreak)).as("obs_value"))
    val grid = obs.groupBy(col(key))
      .agg(floorDiv(min(col("obs_us")) + (stepUs - 1)).as("slot_lo"),
        floorDiv(max(col("obs_us"))).as("slot_hi"))
      .filter(col("slot_lo") <= col("slot_hi")) // sequence() would descend otherwise
      .select(col(key), explode(sequence(col("slot_lo"), col("slot_hi"))).as("slot"))
      .select(col(key), (col("slot") * stepUs).as("slot_us"))

    AsOfJoin.asofBackward(grid, obs,
        on = Seq(key), leftTime = "slot_us", rightTime = "obs_us",
        rightPayload = Seq("obs_value"), tieBreak = "obs_us")
      .select(col(key), col("slot_us"), col("asof_match.obs_value").as("value"))
  }
}
