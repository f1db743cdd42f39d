package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.gtfs.TripMatcher
import graft.streaming.LatestState
import graft.util.StoreFs

/** The reference realtime server's core loop (realtime.py: MQTT
  * message → adapter matching → queue drain into DuckDB tables →
  * feed endpoints read current state), as a Structured Streaming
  * pipeline:
  *
  *   update stream → per-batch nominal matching (TripMatcher against
  *   the static feed) → latest-state merge into a versioned parquet
  *   state table → feed assembly reads the current version.
  *
  * State lives as a distributed parquet table (the DuckDB-file
  * analog), written as immutable versions so readers never see a
  * partial write — the production pattern a table format (Delta/
  * Iceberg) packages, reduced to its core.
  */
object GtfsRtPipeline {

  /** Versioned parquet state table: write vN+1, readers use the max
    * committed version. All paths go through the Hadoop `FileSystem`
    * of the session conf ([[graft.util.StoreFs]]), so the store works
    * unchanged against `file:`, HDFS, or S3A directories.
    *
    * Commit protocol: each version is STAGED in a dot-prefixed
    * sibling (never matched by the `v=` listing), optional metadata
    * markers are added inside it, and one directory rename publishes
    * it — on rename-atomic filesystems a reader (and a crash-replayed
    * writer) sees either the old complete version or the new complete
    * version, never a half-written one, and the state bytes + the
    * applied-batch marker commit TOGETHER (no window where state is
    * merged but unmarked, which would double-merge on foreachBatch
    * replay).
    */
  final class ParquetStateStore(val dir: String) {
    StoreFs.mkdirs(dir)

    def latestVersion: Option[Long] = {
      val versions = StoreFs.listNames(dir)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong)
      if (versions.isEmpty) None else Some(versions.max)
    }

    def read(spark: SparkSession): Option[DataFrame] =
      latestVersion.map(v => spark.read.parquet(s"$dir/v=$v"))

    /** Publish the next version; `appliedTag` (e.g. a foreachBatch
      * batch id) rides inside the version dir as an underscore-
      * prefixed marker file, which parquet readers ignore as hidden.
      */
    def write(df: DataFrame, appliedTag: Option[String] = None): Unit = {
      val next = latestVersion.getOrElse(-1L) + 1
      val staging = s"$dir/.staging-v$next"
      StoreFs.deleteRecursively(staging)
      df.write.mode("overwrite").parquet(staging)
      appliedTag.foreach(t => StoreFs.touch(s"$staging/_applied_tag_$t"))
      StoreFs.rename(staging, s"$dir/v=$next")
    }

    /** The applied tag the latest committed version carries, if any. */
    def lastAppliedTag: Option[String] =
      latestVersion.flatMap { v =>
        StoreFs.listNames(s"$dir/v=$v")
          .find(_.startsWith("_applied_tag_"))
          .map(_.stripPrefix("_applied_tag_"))
      }
  }

  /** Apply one micro-batch: match, merge into latest state, publish
    * the next store version. `tag`, when present, makes the apply
    * EXACTLY-ONCE under foreachBatch crash-replay: the tag commits
    * atomically with the state version (inside the renamed dir), so a
    * writer that crashed after publishing and is re-run with the same
    * batch skips the merge instead of double-applying it.
    */
  def applyBatch(
      batch: DataFrame,
      trips: DataFrame,
      stopTimes: DataFrame,
      store: ParquetStateStore,
      ttlSeconds: Long,
      tag: Option[String] = None): Unit = {
    if (tag.isDefined && store.lastAppliedTag == tag) return // replayed batch: already published
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      val matched = TripMatcher.matchTrips(batch, trips, stopTimes)
      val incoming = matched.withColumn("last_updated_ts", col("event_ts"))
      val merged = store.read(spark) match {
        case Some(prev) => prev.unionByName(incoming, allowMissingColumns = true)
        case None => incoming
      }
      val latest = LatestState.latest(
        merged, Seq("trip_update_id"), col("last_updated_ts"), col("matched_trip_id"))
      store.write(LatestState.withTtlNumeric(latest, col("last_updated_ts"), ttlSeconds), tag)
    }
  }

  /** Start the pipeline over a stream of raw trip updates.
    *
    * @param updates streaming frame: trip_update_id, trip_id,
    *                route_id, start_time, stop_time_updates, event_ts
    * @param trips/stopTimes static nominal feed tables
    * @param ttlSeconds review window — state rows older than
    *                   max(event_ts) - ttl are dropped each batch
    * @param checkpointDir offset/commit checkpoint: a restarted query
    *                   resumes from the last committed offsets and
    *                   RE-RUNS the uncommitted batch — the applied-tag
    *                   guard (scoped to this checkpoint, since batch
    *                   ids restart with a fresh one) keeps that replay
    *                   from double-merging. Without it, each start is
    *                   a fresh query over the same durable store.
    */
  def start(
      updates: DataFrame,
      trips: DataFrame,
      stopTimes: DataFrame,
      store: ParquetStateStore,
      ttlSeconds: Long = 7200L,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val tagPrefix = checkpointDir.map(d =>
      java.lang.Integer.toHexString(d.hashCode) + "-")
    val writer = updates.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, trips, stopTimes, store, ttlSeconds,
          tagPrefix.map(_ + batchId))
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
