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
  /** @param compactEvery every Nth version is COALESCED to
    *        ~`targetFileBytes` files before publishing (inside the
    *        staging dir, so the compaction commits atomically with
    *        the version + applied tag — a reader never sees it);
    *        a long-running ingest otherwise accumulates one file per
    *        input partition per version. 0 disables.
    * @param keepVersions committed versions retained after a publish
    *        (pruned oldest-first); bounds the store's TOTAL file
    *        count, which otherwise grows with every batch even
    *        though readers only ever touch the latest version.
    */
  final class ParquetStateStore(val dir: String,
      val compactEvery: Int = 8,
      val targetFileBytes: Long = 32L * 1024 * 1024,
      val keepVersions: Int = 4) {
    require(keepVersions >= 1, "keepVersions must retain the latest version")
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
      // compaction runs on the STAGING dir: the published version is
      // already compacted, and the tag lands after the rewrite so the
      // two commit together in the publishing rename
      if (compactEvery > 0 && next % compactEvery == 0)
        graft.ops.Compaction.compact(df.sparkSession, staging, targetFileBytes)
      appliedTag.foreach(t => StoreFs.touch(s"$staging/_applied_tag_$t"))
      StoreFs.rename(staging, s"$dir/v=$next")
      // retention: readers only ever resolve the latest committed
      // version, so pruning the tail bounds the store's file count
      StoreFs.listNames(dir)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong)
        .filter(_ <= next - keepVersions)
        .foreach(v => StoreFs.deleteRecursively(s"$dir/v=$v"))
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
