package graft.gtfs

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.util.GraftConfig

/** Serving-composition spec (realtime.py:30-147): configured routing,
  * per-feed TTL response caching, RSS gating. Uses the same fixture
  * rows as GtfsRtProtoSpec so the served bytes equal the golden-wire
  * assemblies.
  */
class RealtimeAppSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def alerts = Seq(
    ("a1", "CONSTRUCTION", "DETOUR", "http://x", "Header A", "Desc A", null.asInstanceOf[String], null.asInstanceOf[String], "WARNING"))
    .toDF("service_alert_id", "cause", "effect", "url", "header_text",
      "description_text", "tts_header_text", "tts_description_text", "severity_level")

  private def activePeriods = Seq(("a1", 100L, 200L))
    .toDF("service_alert_id", "start_timestamp", "end_timestamp")

  private def informedEntities = Seq(
    ("a1", null.asInstanceOf[String], "r1", null.asInstanceOf[Integer], null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String], "s1"))
    .toDF("service_alert_id", "agency_id", "route_id", "route_type", "trip_id",
      "trip_route_id", "trip_direction_id", "trip_start_time", "trip_start_date",
      "trip_schedule_relationship", "stop_id")

  private def alertEntities: DataFrame =
    FeedAssembler.alertEntities(alerts, activePeriods, informedEntities)

  private def vehiclePositions = Seq(
    ("vp1", "t1", "r1", "0", "08:00:00", "20240109", "SCHEDULED",
      "veh1", "Bus 1", null.asInstanceOf[String], null.asInstanceOf[String],
      48.1, 11.5, 90.0, 1234.5, 12.3,
      3, "s3", "IN_TRANSIT_TO", 1704790500L, "RUNNING_SMOOTHLY"))
    .toDF("vehicle_position_id", "trip_id", "trip_route_id", "trip_direction_id",
      "trip_start_time", "trip_start_date", "trip_schedule_relationship",
      "vehicle_id", "vehicle_label", "vehicle_license_plate", "vehicle_wheelchair_accessible",
      "position_latitude", "position_longitude", "position_bearing", "position_odometer",
      "position_speed", "current_stop_sequence", "stop_id", "current_status",
      "timestamp", "congestion_level")

  private def emptyTripUpdates: DataFrame =
    Seq.empty[(String, String)].toDF("id", "x")
      .selectExpr("id", "named_struct('d', x) AS trip_update")

  private def app(yaml: String, clock: () => Long,
      alertCalls: AtomicInteger = new AtomicInteger,
      vpCalls: AtomicInteger = new AtomicInteger): RealtimeApp =
    new RealtimeApp(
      GraftConfig.fromYaml(yaml),
      () => { alertCalls.incrementAndGet(); alertEntities },
      () => emptyTripUpdates,
      () => { vpCalls.incrementAndGet(); FeedAssembler.vehiclePositionEntities(vehiclePositions) },
      clock)

  test("routes mirror the configured routing table; rss only when enabled") {
    val off = app("app:\n  rss_enabled: false\n", () => 0L)
    assert(off.routes.keySet == Set(
      "/gtfs/realtime/service-alerts.pbf",
      "/gtfs/realtime/trip-updates.pbf",
      "/gtfs/realtime/vehicle-positions.pbf"))
    val on = app(
      "app:\n  rss_enabled: true\n  routing:\n    service_alerts_endpoint: /rt/sa.pbf\n",
      () => 0L)
    assert(on.routes.contains("/rt/sa.pbf"))
    assert(on.routes.contains("/gtfs/realtime/rss.xml"))
  }

  test("caching_enabled: assembly runs once per TTL window, recomputes after expiry") {
    var now = 0L
    val alertCalls = new AtomicInteger
    val a = app(
      "app:\n  caching_enabled: true\ncaching:\n  caching_service_alerts_ttl_seconds: 60\n",
      () => now, alertCalls)
    val first = a.serviceAlertsPbf()
    assert(first.nonEmpty && alertCalls.get == 1)
    now += 59 * 1000L
    assert(a.serviceAlertsPbf().sameElements(first) && alertCalls.get == 1)
    now += 2 * 1000L // past TTL
    a.serviceAlertsPbf()
    assert(alertCalls.get == 2)
  }

  test("caching disabled: every request re-assembles (reference serves straight from db)") {
    val vpCalls = new AtomicInteger
    val a = app("app:\n  caching_enabled: false\n", () => 0L, vpCalls = vpCalls)
    a.vehiclePositionsPbf()
    a.vehiclePositionsPbf()
    assert(vpCalls.get == 2)
  }

  test("served alert bytes equal a direct golden assembly at the same timestamp") {
    val ts = 1704790000L
    val a = app("app: {}\n".replace("{}", ""), () => ts * 1000L)
    val served = a.serviceAlertsPbf()
    val direct = GtfsRtProto.feedMessagePbf(alertEntities, "alert", ts)
    assert(served.sameElements(direct))
  }

  test("rssXml renders configured channel metadata and alert items; None when disabled") {
    assert(app("app:\n  rss_enabled: false\n", () => 0L).rssXml().isEmpty)
    val xml = app(
      "app:\n  rss_enabled: true\nrss:\n  title: Spec Alerts\n  language: en-US\n",
      () => 0L).rssXml().get
    assert(xml.contains("<title>Spec Alerts</title>"))
    assert(xml.contains("<language>en-US</language>"))
    assert(xml.contains("Header A"))
    assert(xml.contains("<![CDATA[Desc A]]>"))
  }

  test("review loop ticks on the configured cadence") {
    val ticks = new java.util.concurrent.CountDownLatch(2)
    // data_review_seconds only takes integer seconds; use 1s and
    // startReviewLoop's interval math (1s * 1000)
    val a = app("app:\n  data_review_seconds: 1\n", () => 0L)
    val task = a.startReviewLoop(() => ticks.countDown())
    try assert(ticks.await(10, java.util.concurrent.TimeUnit.SECONDS))
    finally task.shutdown()
  }
}
