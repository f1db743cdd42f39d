package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.gtfs.{GtfsFeed, GtfsFixture}

/** B-surface transport contract: the MQTT-shaped DataSourceV2 source
  * ([[graft.sources.MqttWireProvider]]) feeding topic-tagged payload
  * batches into [[GtfsRtPipeline]] exactly as the reference's
  * `_on_message` does (realtime.py:160-178: route by first matching
  * subscription filter, decode, match, upsert) — published across
  * two micro-batches against a fake broker fixture, then compared to
  * the BATCH golden (the same updates applied through applyBatch
  * directly): transport must not change the assembled state.
  */
class MqttWireSpec extends AnyFunSuite with SparkTestBase {

  private lazy val feed = GtfsFeed.loadStatic(spark, GtfsFixture.writeTo().toString)

  private def payload(id: String, tripId: String, ts: Long): String =
    s"""{"trip_update_id":"$id","trip_id":"$tripId","route_id":"r1","start_time":"08:00:00",""" +
      s""""stop_time_updates":[{"stop_sequence":1,"stop_id":"s1"}],"event_ts":$ts}"""

  // ------------------------------------------------ filter semantics

  test("topicMatches: paho wildcard semantics") {
    import MqttBroker.topicMatches
    assert(topicMatches("gtfsrt/trip_update/#", "gtfsrt/trip_update/de/vgn"))
    assert(topicMatches("gtfsrt/trip_update/#", "gtfsrt/trip_update")) // '#' matches zero levels
    assert(!topicMatches("gtfsrt/trip_update/#", "gtfsrt/alert/de"))
    assert(topicMatches("gtfsrt/+/de", "gtfsrt/alert/de"))   // '+' = exactly one level
    assert(!topicMatches("gtfsrt/+/de", "gtfsrt/a/b/de"))
    assert(!topicMatches("gtfsrt/+", "gtfsrt"))              // '+' never matches zero levels
    assert(topicMatches("#", "anything/at/all"))
    assert(topicMatches("a/b", "a/b") && !topicMatches("a/b", "a/b/c"))
    assert(!topicMatches("a/#/b", "a/x/b"))                  // '#' only valid last
  }

  test("subscriptionType routes by the FIRST matching filter, in order") {
    val subs = Seq("gtfsrt/#" -> "catch_all", "gtfsrt/alert/#" -> "service_alerts")
    assert(MqttBroker.subscriptionType(subs, "gtfsrt/alert/de").contains("catch_all"))
    assert(MqttBroker.subscriptionType(subs.reverse, "gtfsrt/alert/de")
      .contains("service_alerts"))
    assert(MqttBroker.subscriptionType(subs, "other/x").isEmpty)
  }

  // ------------------------------------- end-to-end over the source

  test("2 micro-batches through the DSv2 source == the batch golden; unsubscribed topics never delivered") {
    val brokerName = "rt-spec-" + System.nanoTime()
    val broker = MqttBroker.get(brokerName)
    val stateDir = java.nio.file.Files.createTempDirectory("rt_mqtt_state").toString
    val store = new GtfsRtPipeline.ParquetStateStore(stateDir)

    val wire = spark.readStream.format("graft-mqtt")
      .option("broker", brokerName)
      .option("subscriptions",
        "gtfsrt/trip_update/#:trip_updates,gtfsrt/alert/#:service_alerts")
      .load()
    val updates = UpdateWire.parseUpdates(
      wire.filter(col("sub_type") === "trip_updates"), valueCol = "payload")
    val q = GtfsRtPipeline.start(updates,
      feed.table("trips"), feed.table("stop_times"), store, ttlSeconds = 7200L)
    try {
      // ---- micro-batch 1: one direct match, one candidate match, an
      // alert on a SUBSCRIBED other-type topic (must not reach the
      // trip pipeline), one unsubscribed topic (must not be delivered)
      broker.publish("gtfsrt/trip_update/de/vgn", payload("tu1", "t1", 100L), 100L)
      broker.publish("gtfsrt/trip_update/de/vgn", payload("tu2", "veh-77", 100L), 100L)
      broker.publish("gtfsrt/alert/de", """{"alert":"ignored by trip route"}""", 100L)
      broker.publish("weather/de", payload("tuX", "t1", 100L), 100L)
      q.processAllAvailable()
      val s1 = store.read(spark).get.collect()
        .map(r => r.getAs[String]("trip_update_id")).toSet
      assert(s1 == Set("tu1", "tu2"), s"batch-1 state: $s1")

      // ---- micro-batch 2: newer tu1 pushes event time past the TTL
      // window, aging tu2 out — the socket spec's semantics, here
      // across the broker transport
      broker.publish("gtfsrt/trip_update/de/vgn", payload("tu1", "t1", 7301L), 7301L)
      q.processAllAvailable()
      val s2 = store.read(spark).get.collect()
        .map(r => r.getAs[String]("trip_update_id") -> r.getAs[Long]("last_updated_ts"))
        .toMap
      assert(s2 == Map("tu1" -> 7301L), s"batch-2 state: $s2")
    } finally {
      q.stop()
      MqttBroker.drop(brokerName)
    }

    // ---- batch golden: the SAME updates applied directly through
    // applyBatch with the same batch split — transport equivalence
    import spark.implicits._
    val goldenStore = new GtfsRtPipeline.ParquetStateStore(
      java.nio.file.Files.createTempDirectory("rt_mqtt_golden").toString)
    val b1 = UpdateWire.parseUpdates(
      Seq(payload("tu1", "t1", 100L), payload("tu2", "veh-77", 100L)).toDF("value"))
    val b2 = UpdateWire.parseUpdates(Seq(payload("tu1", "t1", 7301L)).toDF("value"))
    GtfsRtPipeline.applyBatch(b1, feed.table("trips"), feed.table("stop_times"),
      goldenStore, ttlSeconds = 7200L)
    GtfsRtPipeline.applyBatch(b2, feed.table("trips"), feed.table("stop_times"),
      goldenStore, ttlSeconds = 7200L)
    val streamed = store.read(spark).get
      .select("trip_update_id", "matched_trip_id", "last_updated_ts")
      .collect().map(_.toSeq).toSet
    val golden = goldenStore.read(spark).get
      .select("trip_update_id", "matched_trip_id", "last_updated_ts")
      .collect().map(_.toSeq).toSet
    assert(streamed == golden, s"streamed $streamed != golden $golden")
  }

  test("offset replay: a restarted query resumes from the committed offset, no double-apply") {
    val brokerName = "rt-replay-" + System.nanoTime()
    val broker = MqttBroker.get(brokerName)
    val stateDir = java.nio.file.Files.createTempDirectory("rt_mqtt_replay").toString
    val checkpoint = java.nio.file.Files.createTempDirectory("rt_mqtt_ckpt").toString
    val store = new GtfsRtPipeline.ParquetStateStore(stateDir)

    def startQuery() = GtfsRtPipeline.start(
      UpdateWire.parseUpdates(
        spark.readStream.format("graft-mqtt")
          .option("broker", brokerName)
          .option("subscriptions", "gtfsrt/trip_update/#:trip_updates")
          .load()
          .filter(col("sub_type") === "trip_updates"), valueCol = "payload"),
      feed.table("trips"), feed.table("stop_times"), store,
      ttlSeconds = 7200L, checkpointDir = Some(checkpoint))

    var q = startQuery()
    try {
      broker.publish("gtfsrt/trip_update/x", payload("tu1", "t1", 100L), 100L)
      q.processAllAvailable()
      val v1 = store.latestVersion.get
      q.stop()

      // messages arriving while the consumer is DOWN
      broker.publish("gtfsrt/trip_update/x", payload("tu2", "veh-77", 150L), 150L)
      q = startQuery()
      q.processAllAvailable()
      val rows = store.read(spark).get.collect()
        .map(r => r.getAs[String]("trip_update_id")).sorted
      assert(rows.toSeq == Seq("tu1", "tu2"),
        s"resumed query delivered exactly the tail: ${rows.toSeq}")
      assert(store.latestVersion.get > v1)
    } finally {
      q.stop()
      MqttBroker.drop(brokerName)
    }
  }
}
