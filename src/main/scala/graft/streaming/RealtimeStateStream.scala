package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expression of the reference's realtime
  * server state (realtime.py + ddb.py realtime queues): a continuous
  * stream of entity updates maintained as a latest-state store with
  * TTL eviction.
  *
  * The reference polls queues every 15 s, delete-then-inserts the
  * latest version of each entity, and deletes entities unseen for
  * `data_review_seconds`. Here that is `flatMapGroupsWithState`
  * keyed by entity id: state = newest update per key, processing-time
  * timeout = TTL. State is O(live keys) — stream volume never
  * accumulates.
  */
object RealtimeStateStream {

  /** Switch the session's streaming state store to RocksDB
    * (changelog-checkpointed, spillable) — the production provider
    * for 100 TB-scale state: the default HDFSBackedStateStoreProvider
    * keeps every live key on-heap per executor, RocksDB keeps state
    * off-heap/on-disk with incremental checkpoints. Call before
    * starting queries; applies to new queries in this session.
    */
  def useRocksDbStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }

  /** Restore the default on-heap provider (tests). */
  def useDefaultStateStore(spark: SparkSession): Unit = {
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
  }

  /** A generic realtime entity update (trip update / vehicle position
    * / alert all reduce to this for state purposes).
    */
  case class EntityUpdate(entityId: String, timestamp: Long, payload: String, isDeleted: Boolean)

  /** Current state emitted downstream on every change. */
  case class EntityState(entityId: String, timestamp: Long, payload: String)

  /** Fold a micro-batch of updates into per-key state:
    *  - newest timestamp wins (late/duplicate updates ignored),
    *  - is_deleted removes the entity (adapter/gtfsrt.py:49-51),
    *  - TTL timeout evicts idle entities (ddb.py:282-293).
    */
  def updateState(ttlMs: Option[Long])(
      key: String,
      updates: Iterator[EntityUpdate],
      state: GroupState[EntityState]): Iterator[EntityState] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val incoming = updates.toSeq
      val deleted = incoming.exists(_.isDeleted)
      val newest = (incoming.filterNot(_.isDeleted).map(u => EntityState(u.entityId, u.timestamp, u.payload)) ++
        state.getOption.toSeq).sortBy(-_.timestamp).headOption
      if (deleted) {
        state.remove()
        Iterator.empty
      } else newest match {
        case Some(s) =>
          state.update(s)
          ttlMs.foreach(state.setTimeoutDuration)
          Iterator.single(s)
        case None => Iterator.empty
      }
    }
  }

  /** Wire a stream of updates into the latest-state store.
    * ttlMs=None disables eviction (useful for bounded test streams —
    * processing-time timeouts keep scheduling wake-up batches).
    */
  def latestStateStream(
      spark: SparkSession,
      updates: Dataset[EntityUpdate],
      ttlMs: Option[Long] = Some(2 * 60 * 60 * 1000L)): Dataset[EntityState] = {
    import spark.implicits._
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    updates
      .groupByKey(_.entityId)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(updateState(ttlMs))
  }

  /** Watermarked tumbling-window aggregation over an event stream —
    * the monitoring-counter shape (B2). Append mode: windows close
    * once the watermark passes.
    */
  def windowedCounts(
      events: org.apache.spark.sql.DataFrame,
      tsCol: String,
      typeCol: String,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): org.apache.spark.sql.DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"), max(col("value")).as("max_value"))

  /** Watermarked windowed DISTINCT counting via the mergeable HLL
    * sketch aggregate (C17): `count(DISTINCT x)` is unsupported on
    * streams (exact distinct state is unbounded), but the sketch's
    * partial/merge contract is exactly what incremental execution
    * needs — per-micro-batch partials merge into windowed state of
    * constant size (2^precision registers per open window), and the
    * emitted estimate converges on the true distinct count. The
    * batch-vs-stream parity spec is the B-section proof that the
    * sketch family composes with Structured Streaming.
    */
  def windowedDistinct(
      events: org.apache.spark.sql.DataFrame,
      tsCol: String,
      typeCol: String,
      distinctCol: String,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): org.apache.spark.sql.DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n"),
        graft.plans.HllSketch.hllEstimate(
          graft.plans.HllSketch.hllSketch(col(distinctCol))).as("n_distinct_est"))

  /** Gap-based session aggregation over an event-time stream —
    * the streaming twin of the batch sessionization query
    * (CoreQueries q_sessionize): a session extends while events
    * arrive within `gap` of the previous one, closes when the
    * watermark passes the gap. State is per OPEN session (merged
    * incrementally by the session-window state store), not per event.
    */
  def sessionCounts(
      events: org.apache.spark.sql.DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): org.apache.spark.sql.DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
