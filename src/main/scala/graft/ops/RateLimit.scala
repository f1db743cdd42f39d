package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-key windowed rate limiting — quota replay over an event log:
  * keep only the first `n` events per (key, time-window), the batch
  * twin of an API throttle / per-user ingestion cap (and, in corpus
  * land, the per-source per-day document cap that stops one crawler
  * burst from dominating a day's shard).
  *
  * Scale shape: one shuffle keyed by (key, window) feeds a ranked
  * window whose partitions are bounded by per-key-per-window volume;
  * there is no global sort and no state beyond the window group.
  * Ordering inside a group is (ts, tiebreak) with an explicit
  * tiebreak column, so the kept set is deterministic under any
  * partitioning — and therefore engine-portable and oracle-exact.
  */
object RateLimit {

  /** Events surviving the limit of `n` per key per hour:
    * input row plus (hour_us, seq) where seq is the 1-based arrival
    * rank inside the (key, hour) group.
    */
  def keepFirstNPerHour(df: DataFrame, key: Column, ts: Column, tiebreak: Column,
      n: Int): DataFrame = {
    require(n >= 1)
    val w = Window.partitionBy(col("__k"), col("__h"))
      .orderBy(col("__ts"), col("__tb"))
    df
      .withColumn("__k", key)
      .withColumn("__h", unix_micros(date_trunc("hour", ts)))
      .withColumn("__ts", ts)
      .withColumn("__tb", tiebreak)
      .withColumn("__seq", row_number().over(w))
      .filter(col("__seq") <= n)
      .withColumn("hour_us", col("__h"))
      .withColumn("seq", col("__seq").cast("bigint"))
      .drop("__k", "__h", "__ts", "__tb", "__seq")
  }
}
