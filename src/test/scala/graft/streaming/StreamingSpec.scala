package graft.streaming

import org.apache.spark.api.java.Optional

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.RealtimeStateStream.{EntityState, EntityUpdate}

class StreamingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("latest-state stream: newest wins, deletes evict") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EntityUpdate]
    val states = RealtimeStateStream.latestStateStream(spark, input.toDS(), ttlMs = None)

    val query = states.writeStream
      .format("memory")
      .queryName("latest_state_test")
      .outputMode("update")
      .start()
    try {
      input.addData(
        EntityUpdate("trip-1", 100L, "v1", isDeleted = false),
        EntityUpdate("trip-2", 100L, "v1", isDeleted = false))
      query.processAllAvailable()

      // newer update replaces, older duplicate is ignored
      input.addData(
        EntityUpdate("trip-1", 200L, "v2", isDeleted = false),
        EntityUpdate("trip-2", 50L, "stale", isDeleted = false))
      query.processAllAvailable()

      val latest = spark.table("latest_state_test").as[EntityState].collect()
        .groupBy(_.entityId).map { case (k, vs) => k -> vs.maxBy(_.timestamp) }
      assert(latest("trip-1").payload == "v2")
      assert(latest("trip-2").payload == "v1") // stale ignored

      // delete evicts: no further emission for trip-1
      input.addData(EntityUpdate("trip-1", 300L, "x", isDeleted = true))
      query.processAllAvailable()
      val afterDelete = spark.table("latest_state_test").as[EntityState].collect()
      assert(!afterDelete.exists(s => s.entityId == "trip-1" && s.timestamp >= 300L))
    } finally query.stop()
  }

  test("latest-state stream produces identical results on the RocksDB state store") {
    implicit val sqlCtx = spark.sqlContext
    RealtimeStateStream.useRocksDbStateStore(spark)
    try {
      val input = MemoryStream[EntityUpdate]
      val states = RealtimeStateStream.latestStateStream(spark, input.toDS(), ttlMs = None)
      val query = states.writeStream
        .format("memory").queryName("rocksdb_state_test").outputMode("update").start()
      try {
        // provider actually engaged (fail loudly if the conf was ignored)
        assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
          .contains("RocksDBStateStoreProvider"))
        input.addData(
          EntityUpdate("trip-1", 100L, "v1", isDeleted = false),
          EntityUpdate("trip-2", 100L, "v1", isDeleted = false))
        query.processAllAvailable()
        input.addData(
          EntityUpdate("trip-1", 200L, "v2", isDeleted = false),
          EntityUpdate("trip-2", 50L, "stale", isDeleted = false),
          EntityUpdate("trip-3", 300L, "v1", isDeleted = false))
        query.processAllAvailable()
        input.addData(EntityUpdate("trip-3", 400L, "x", isDeleted = true))
        query.processAllAvailable()

        val latest = spark.table("rocksdb_state_test").as[EntityState].collect()
          .groupBy(_.entityId).map { case (k, vs) => k -> vs.maxBy(_.timestamp) }
        assert(latest("trip-1").payload == "v2")
        assert(latest("trip-2").payload == "v1")
        assert(!latest.get("trip-3").exists(_.timestamp >= 400L))
      } finally query.stop()
    } finally RealtimeStateStream.useDefaultStateStore(spark)
  }

  test("windowed counts with watermark over a bounded stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val agg = RealtimeStateStream.windowedCounts(events, "ts", "event_type",
      windowLen = "1 hour", watermark = "0 seconds")
    val query = agg.writeStream
      .format("memory").queryName("windowed_test").outputMode("complete").start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "click", 3.0),
        (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "click", 5.0))
      query.processAllAvailable()
      val rows = spark.table("windowed_test")
        .select(col("window.start").cast("string"), col("n"), col("min_value"), col("max_value"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", 2L, 1.0, 3.0),
        ("2024-01-01 11:00:00", 1L, 5.0, 5.0)))
    } finally query.stop()
  }

  test("streaming windowed top items via Misra-Gries: partials merge across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    val events = input.toDF().toDF("ts", "event_type", "item")

    val agg = RealtimeStateStream.windowedTopItems(events, "ts", "event_type", "item",
      k = 8, windowLen = "1 hour", watermark = "0 seconds")
    val query = agg.writeStream
      .format("memory").queryName("windowed_top_test").outputMode("complete").start()
    try {
      val t = (m: String) => java.sql.Timestamp.valueOf(s"2024-01-01 10:$m:00")
      // batch 1: "hot" x 40, "warm" x 20, tail of 15 singletons
      input.addData((1 to 40).map(_ => (t("05"), "click", "hot")) ++
        (1 to 20).map(_ => (t("10"), "click", "warm")) ++
        (1 to 15).map(i => (t("15"), "click", s"t$i")): _*)
      query.processAllAvailable()
      // batch 2: "hot" keeps climbing — counters must MERGE, not reset
      input.addData((1 to 30).map(_ => (t("20"), "click", "hot")): _*)
      query.processAllAvailable()

      val rows = spark.table("windowed_top_test")
        .select(col("n"), col("top_items")).collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 105L)
      val top = rows.head.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getString(0), r.getLong(1)))
      // n/k bound = 105/8 ≈ 13: both true heavies must survive, in order
      assert(top.head._1 == "hot" && top.head._2 >= 70L - 105L / 8 && top.head._2 <= 70L)
      assert(top(1)._1 == "warm" && top(1)._2 >= 20L - 105L / 8 && top(1)._2 <= 20L)
    } finally query.stop()
  }

  test("streaming windowed distinct via HLL sketch: partials merge across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val events = input.toDF().toDF("ts", "event_type", "user_id")

    val agg = RealtimeStateStream.windowedDistinct(events, "ts", "event_type", "user_id",
      windowLen = "1 hour", watermark = "0 seconds")
    val query = agg.writeStream
      .format("memory").queryName("windowed_distinct_test").outputMode("complete").start()
    try {
      val t = (m: String) => java.sql.Timestamp.valueOf(s"2024-01-01 10:$m:00")
      // batch 1: users 1..30 click (10 duplicated)
      input.addData((1L to 30L).map(u => (t("05"), "click", u)) ++
        (1L to 10L).map(u => (t("10"), "click", u)): _*)
      query.processAllAvailable()
      // batch 2: users 21..50 click -> global distinct 1..50; state merged, not recounted
      input.addData((21L to 50L).map(u => (t("20"), "click", u)): _*)
      query.processAllAvailable()

      val row = spark.table("windowed_distinct_test")
        .select(col("n"), col("n_distinct_est")).collect().head
      assert(row.getLong(0) == 70L)
      // small-cardinality HLL is near-exact; allow 2%
      assert(math.abs(row.getLong(1) - 50L) <= 1L)

      // parity: the same frame aggregated in batch gives the same estimate
      val batchEst = spark.table("windowed_distinct_test").sparkSession
        .createDataFrame(((1L to 30L).map(u => (t("05"), "click", u)) ++
          (1L to 10L).map(u => (t("10"), "click", u)) ++
          (21L to 50L).map(u => (t("20"), "click", u))))
        .toDF("ts", "event_type", "user_id")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(graft.plans.HllSketch.hllEstimate(
          graft.plans.HllSketch.hllSketch(col("user_id"))).as("est"))
        .select("est").collect().head.getLong(0)
      assert(batchEst == row.getLong(1))
    } finally query.stop()
  }

  test("streaming rate limit: n per key-hour across micro-batches, counter survives batches") {
    implicit val sqlCtx = spark.sqlContext
    import RealtimeStateStream.{AdmittedEvent, QuotaEvent}
    val input = MemoryStream[QuotaEvent]
    val admitted = RealtimeStateStream.rateLimitedStream(spark, input.toDS(), n = 3, ttlMs = None)
    val query = admitted.writeStream
      .format("memory").queryName("rate_limit_test").outputMode("append").start()
    try {
      val h0 = 1704103200000L // some hour boundary
      // batch 1: 4 events for u in one hour -> 3 admitted; v gets 1
      input.addData(
        QuotaEvent("u", h0 + 1000, "a"), QuotaEvent("u", h0 + 2000, "b"),
        QuotaEvent("u", h0 + 3000, "c"), QuotaEvent("u", h0 + 4000, "d"),
        QuotaEvent("v", h0 + 1000, "x"))
      query.processAllAvailable()
      // batch 2: same hour -> still over quota for u; next hour resets
      input.addData(
        QuotaEvent("u", h0 + 5000, "e"),
        QuotaEvent("u", h0 + 3600000 + 1000, "f"))
      query.processAllAvailable()

      val got = spark.table("rate_limit_test").as[AdmittedEvent].collect()
      val uPayloads = got.filter(_.key == "u").sortBy(_.eventTimeMs).map(e => (e.payload, e.seq))
      assert(uPayloads.toSeq == Seq(("a", 1), ("b", 2), ("c", 3), ("f", 1)))
      assert(got.filter(_.key == "v").map(_.payload).toSeq == Seq("x"))
    } finally query.stop()
  }

  test("streaming exact dedup: duplicates within the watermark emit once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "content_key")
      .withWatermark("ts", "1 hour")
      // state is bounded by the watermark horizon: O(keys in window),
      // the streaming twin of Dedup.exact's content_key grouping
      .dropDuplicatesWithinWatermark("content_key")

    val query = docs.writeStream
      .format("memory").queryName("stream_dedup_test").outputMode("append").start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "k1"),
        (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 2L, "k1"), // dup of k1
        (java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 3L, "k2"))
      query.processAllAvailable()
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 4L, "k1")) // still a dup
      query.processAllAvailable()
      val keys = spark.table("stream_dedup_test")
        .select("content_key").collect().map(_.getString(0)).toSeq
      assert(keys.sorted == Seq("k1", "k2")) // each key exactly once
    } finally query.stop()
  }

  test("session windows merge events within the gap and split across it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "user", "value")

    val agg = RealtimeStateStream.sessionCounts(events, "ts", "user",
      gap = "30 minutes", watermark = "0 seconds")
    val query = agg.writeStream
      .format("memory").queryName("session_test").outputMode("complete").start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "u1", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 10:20:00"), "u1", 1.0), // same session
        (java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), "u1", 1.0), // gap > 30m: new session
        (java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), "u2", 1.0))
      query.processAllAvailable()
      val rows = spark.table("session_test")
        .select(col("user"), col("session_start").cast("string"), col("n_events"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        ("u1", "2024-01-01 10:00:00", 2L),
        ("u1", "2024-01-01 11:30:00", 1L),
        ("u2", "2024-01-01 10:10:00", 1L)))
    } finally query.stop()
  }

  test("updateState handles TTL timeout, stale updates, and deletes") {
    import org.apache.spark.sql.streaming.TestGroupState
    // timeout fires -> state removed, nothing emitted
    val timedOut = TestGroupState.create[EntityState](
      Optional.of(EntityState("trip-1", 100L, "v1")),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    val out = RealtimeStateStream.updateState(Some(60000L))("trip-1", Iterator.empty, timedOut)
    assert(out.isEmpty && timedOut.isRemoved)

    // newest of a batch wins over stored state
    val st = TestGroupState.create[EntityState](
      Optional.of(EntityState("trip-1", 100L, "v1")),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val out2 = RealtimeStateStream.updateState(Some(60000L))("trip-1",
      Iterator(
        EntityUpdate("trip-1", 300L, "v3", isDeleted = false),
        EntityUpdate("trip-1", 200L, "v2", isDeleted = false)), st).toSeq
    assert(out2 == Seq(EntityState("trip-1", 300L, "v3")))
    assert(st.get == EntityState("trip-1", 300L, "v3"))

    // delete marker removes state
    val st3 = TestGroupState.create[EntityState](
      Optional.of(EntityState("trip-1", 300L, "v3")),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val out3 = RealtimeStateStream.updateState(Some(60000L))("trip-1",
      Iterator(EntityUpdate("trip-1", 400L, "x", isDeleted = true)), st3)
    assert(out3.isEmpty && st3.isRemoved)
  }

  test("updateState: newest-timestamp-wins applies to deletes too") {
    import org.apache.spark.sql.streaming.TestGroupState
    // a STALE delete in the same batch as a newer upsert must not evict
    val st = TestGroupState.create[EntityState](
      Optional.empty[EntityState],
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val out = RealtimeStateStream.updateState(Some(60000L))("trip-1",
      Iterator(
        EntityUpdate("trip-1", 200L, "x", isDeleted = true),
        EntityUpdate("trip-1", 300L, "v3", isDeleted = false)), st).toSeq
    assert(out == Seq(EntityState("trip-1", 300L, "v3")))
    assert(st.get == EntityState("trip-1", 300L, "v3"))

    // a delete OLDER than the stored state must not evict either
    val st2 = TestGroupState.create[EntityState](
      Optional.of(EntityState("trip-1", 300L, "v3")),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val out2 = RealtimeStateStream.updateState(Some(60000L))("trip-1",
      Iterator(EntityUpdate("trip-1", 250L, "x", isDeleted = true)), st2).toSeq
    assert(out2 == Seq(EntityState("trip-1", 300L, "v3")))
    assert(!st2.isRemoved)

    // at EQUAL timestamps the delete beats the upsert (the A41 CDC rule)
    val st3 = TestGroupState.create[EntityState](
      Optional.empty[EntityState],
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val out3 = RealtimeStateStream.updateState(Some(60000L))("trip-1",
      Iterator(
        EntityUpdate("trip-1", 300L, "v3", isDeleted = false),
        EntityUpdate("trip-1", 300L, "x", isDeleted = true)), st3)
    assert(out3.isEmpty && st3.isRemoved)
  }

  test("file-source stream over the real events table matches the batch result") {
    // stream the parquet events table (ns ts read as long, converted
    // like Tables.read does), window-aggregate, compare to batch
    val batchEvents = graft.Tables.read(spark, "/root/testdata/sf0.001", "events")
    val expected = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .collect().map(r => (r.getStruct(0).toString, r.getString(1), r.getLong(2))).toSet

    // file streams read directories: stage the table file into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val rawSchema = spark.read
      .option("inferTimestampNTZ", "false")
      .parquet("/root/testdata/sf0.001/events.parquet").schema
    val streamRaw = spark.readStream
      .schema(rawSchema)
      .parquet(dir.toString)
    // same observed-type normalization as Tables.read: older testdata
    // generations ship ts as TIMESTAMP(NANOS) (long under nanosAsLong),
    // newer ones as native micros
    val stream =
      if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        streamRaw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else streamRaw
    val agg = RealtimeStateStream.windowedCounts(stream, "ts", "event_type",
      windowLen = "1 hour", watermark = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("file_stream_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_stream_test")
        .collect().map(r => (r.getStruct(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("stream-stream interval join: purchases matched to clicks within the hour") {
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[(Long, java.sql.Timestamp)]
    val buysIn = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = clicksIn.toDF().toDF("user_id", "click_ts").withWatermark("click_ts", "2 hours")
    val buys = buysIn.toDF().toDF("buy_user", "buy_ts").withWatermark("buy_ts", "2 hours")
    val joined = buys.join(clicks,
      expr("user_id = buy_user AND click_ts <= buy_ts AND click_ts >= buy_ts - INTERVAL 1 HOUR"))
    val q = joined.writeStream.format("memory").queryName("ss_join_test")
      .outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      clicksIn.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 08:00:00")))
      buysIn.addData((1L, ts("2024-01-01 10:30:00")), (2L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      val rows = spark.table("ss_join_test")
        .select("buy_user").collect().map(_.getLong(0)).toSeq
      // user 1's click is within the hour; user 2's was 2.5h earlier
      assert(rows == Seq(1L))
    } finally q.stop()
  }

  test("batch LatestState.latest matches streaming semantics") {
    val df = Seq(
      ("trip-1", 100L, "v1"),
      ("trip-1", 200L, "v2"),
      ("trip-2", 100L, "v1")).toDF("entity_id", "ts", "payload")
    val latest = LatestState.latest(df, Seq("entity_id"), col("ts"), col("payload"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(latest == Map("trip-1" -> "v2", "trip-2" -> "v1"))
  }

  test("batch TTL expiry drops rows older than the review window") {
    val df = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("b", java.sql.Timestamp.valueOf("2024-01-01 11:30:00")),
      ("c", java.sql.Timestamp.valueOf("2024-01-01 12:00:00"))).toDF("id", "ts")
    val live = LatestState.withTtl(df, col("ts"), ttlSeconds = 7200)
      .select("id").collect().map(_.getString(0)).toSet
    assert(live == Set("b", "c")) // "a" is exactly 2h older than max -> expired
  }
}
