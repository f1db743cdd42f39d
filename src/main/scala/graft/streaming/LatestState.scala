package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch form of the reference's realtime queue semantics
  * (ddb.py:282-332): the store holds exactly the latest version of
  * each entity, and entities not refreshed within the review window
  * expire.
  */
object LatestState {

  /** Latest row per key: window row_number over (orderCol desc,
    * tieBreak desc) — one shuffle on the key columns.
    */
  def latest(df: DataFrame, keys: Seq[String], orderCol: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(orderCol.desc, tieBreak.desc)
    df.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .drop("graft_rn")
  }

  /** TTL expiry relative to the newest timestamp in the frame
    * (ddb.py:282-293's `data_review_seconds`): rows older than
    * (max(ts) - ttlSeconds) are dropped. Scalar aggregate via cross
    * join — no driver-side collect.
    */
  def withTtl(df: DataFrame, tsCol: Column, ttlSeconds: Long): DataFrame = {
    val cutoff = df.agg((max(tsCol) - expr(s"INTERVAL $ttlSeconds SECONDS")).as("graft_cutoff"))
    df.crossJoin(cutoff).filter(tsCol > col("graft_cutoff")).drop("graft_cutoff")
  }

  /** Same review-window semantics over a numeric (epoch) column. */
  def withTtlNumeric(df: DataFrame, tsCol: Column, ttl: Long): DataFrame = {
    val cutoff = df.agg((max(tsCol) - ttl).as("graft_cutoff"))
    df.crossJoin(cutoff).filter(tsCol > col("graft_cutoff")).drop("graft_cutoff")
  }
}
