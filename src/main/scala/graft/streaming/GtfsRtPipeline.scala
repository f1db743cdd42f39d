package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.gtfs.TripMatcher
import graft.streaming.LatestState

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
    * committed version.
    */
  final class ParquetStateStore(val dir: String) {
    Files.createDirectories(Paths.get(dir))

    def latestVersion: Option[Long] = {
      val p = Paths.get(dir)
      val versions = Files.list(p).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong)
        .toSeq
      if (versions.isEmpty) None else Some(versions.max)
    }

    def read(spark: SparkSession): Option[DataFrame] =
      latestVersion.map(v => spark.read.parquet(s"$dir/v=$v"))

    def write(df: DataFrame): Unit = {
      val next = latestVersion.getOrElse(-1L) + 1
      df.write.mode("overwrite").parquet(s"$dir/v=$next")
    }
  }

  /** Start the pipeline over a stream of raw trip updates.
    *
    * @param updates streaming frame: trip_update_id, trip_id,
    *                route_id, start_time, stop_time_updates, event_ts
    * @param trips/stopTimes static nominal feed tables
    * @param ttlSeconds review window — state rows older than
    *                   max(event_ts) - ttl are dropped each batch
    */
  def start(
      updates: DataFrame,
      trips: DataFrame,
      stopTimes: DataFrame,
      store: ParquetStateStore,
      ttlSeconds: Long = 7200L): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
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
          store.write(LatestState.withTtlNumeric(latest, col("last_updated_ts"), ttlSeconds))
        }
      }
      .start()
}
