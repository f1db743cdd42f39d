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
    * for 100 TB-scale state: Spark's HDFSBackedStateStoreProvider
    * keeps every live key on-heap per executor, RocksDB keeps state
    * off-heap/on-disk with incremental checkpoints. This is already
    * [[graft.GraftSession]]'s DEFAULT; call this only to opt a
    * foreign session in. Applies to new queries in the session.
    */
  def useRocksDbStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }

  /** Opt out to Spark's on-heap HDFS-backed provider (small fixed key
    * spaces / tests). An explicit SET, not an unset — the session
    * default is RocksDB (GraftSession), so unsetting would not leave
    * the on-heap provider.
    */
  def useDefaultStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
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
      // Newest-timestamp-wins applies to deletes too: a stale delete
      // arriving in the same batch as (or after) a newer upsert must
      // NOT remove the entity. Pick the single winning record across
      // incoming updates and stored state, then apply its flag; at
      // equal timestamps a delete beats an upsert (the A41 CDC rule).
      val stored = state.getOption.map(s =>
        EntityUpdate(s.entityId, s.timestamp, s.payload, isDeleted = false))
      val winner = (updates.toSeq ++ stored)
        .sortBy(u => (-u.timestamp, !u.isDeleted)).headOption
      winner match {
        case Some(u) if u.isDeleted =>
          state.remove()
          Iterator.empty
        case Some(u) =>
          val s = EntityState(u.entityId, u.timestamp, u.payload)
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

  /** An event admitted by [[rateLimitedStream]], tagged with its
    * 1-based rank inside its (key, hour) quota window.
    */
  case class AdmittedEvent(key: String, eventTimeMs: Long, payload: String, seq: Int)

  /** A rate-limit input event. */
  case class QuotaEvent(key: String, eventTimeMs: Long, payload: String)

  /** Rate-limiter state: one (hour, count) pair per live key. */
  case class QuotaState(hourStartMs: Long, admitted: Int)

  /** Streaming per-key rate limiting — the continuous twin of the
    * batch `ops.RateLimit` (A42): admit at most `n` events per key
    * per hour of EVENT time, drop the rest as they arrive. State per
    * key is a single (hour, count) pair — O(live keys), independent
    * of stream volume; a processing-time TTL evicts idle keys.
    * Within a micro-batch events are admitted in (eventTime, payload)
    * order so replays of the same batch admit the same set. The
    * single-counter state assumes per-key hours are non-decreasing
    * across batches (an out-of-order PREVIOUS-hour event reopens a
    * fresh window) — the honest trade for O(1) state per key.
    */
  def rateLimitedStream(
      spark: SparkSession,
      events: Dataset[QuotaEvent],
      n: Int,
      ttlMs: Option[Long] = Some(2 * 60 * 60 * 1000L)): Dataset[AdmittedEvent] = {
    import spark.implicits._
    require(n >= 1)
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    def admit(key: String, updates: Iterator[QuotaEvent],
        state: GroupState[QuotaState]): Iterator[AdmittedEvent] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[AdmittedEvent]
        var st = state.getOption.getOrElse(QuotaState(-1L, 0))
        updates.toSeq.sortBy(e => (e.eventTimeMs, e.payload)).foreach { e =>
          val hour = e.eventTimeMs - java.lang.Math.floorMod(e.eventTimeMs, 3600000L)
          if (hour != st.hourStartMs) st = QuotaState(hour, 0)
          if (st.admitted < n) {
            st = st.copy(admitted = st.admitted + 1)
            out += AdmittedEvent(key, e.eventTimeMs, e.payload, st.admitted)
          }
        }
        state.update(st)
        ttlMs.foreach(state.setTimeoutDuration)
        out.iterator
      }
    }

    events.groupByKey(_.key).flatMapGroupsWithState(OutputMode.Append, timeout)(admit)
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

  /** Streaming windowed heavy hitters — the C23 Misra-Gries analog
    * of [[windowedDistinct]] (B11): the exact per-item top list is
    * unbounded on a stream (full key space in state), the MG sketch
    * keeps k counters per open window with the standard n/k
    * undercount bound, and its partial/merge contract makes stream
    * and batch summaries identical. The "what's trending in this
    * window" wire for event/crawl monitoring.
    */
  def windowedTopItems(
      events: org.apache.spark.sql.DataFrame,
      tsCol: String,
      typeCol: String,
      itemCol: String,
      k: Int = 16,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): org.apache.spark.sql.DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n"),
        graft.plans.FreqSketch.freqItems(col(itemCol), k).as("top_items"))

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
