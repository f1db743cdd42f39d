package graft.gtfs

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FeedAssemblerSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tripUpdates = Seq(
    ("tu1", "t1", "r1", "0", "08:00:00", "20240109", "SCHEDULED", null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String]),
    ("tu2", "t2", "r1", "1", "09:00:00", "20240109", "SCHEDULED", "veh1", "Bus 1", null.asInstanceOf[String], null.asInstanceOf[String]))
    .toDF("trip_update_id", "trip_id", "trip_route_id", "trip_direction_id",
      "trip_start_time", "trip_start_date", "trip_schedule_relationship",
      "vehicle_id", "vehicle_label", "vehicle_license_plate", "vehicle_wheelchair_accessible")

  private def stopTimeUpdates = Seq(
    ("tu1", 2, "s2", null.asInstanceOf[java.lang.Long], Int.box(60), null.asInstanceOf[Integer], null.asInstanceOf[java.lang.Long], Int.box(60), null.asInstanceOf[Integer], "SCHEDULED"),
    ("tu1", 1, "s1", null.asInstanceOf[java.lang.Long], Int.box(0), null.asInstanceOf[Integer], java.lang.Long.valueOf(1704790800L), Int.box(0), null.asInstanceOf[Integer], "SCHEDULED"))
    .toDF("trip_update_id", "stop_sequence", "stop_id", "arrival_time", "arrival_delay",
      "arrival_uncertainty", "departure_time", "departure_delay", "departure_uncertainty",
      "schedule_relationship")

  test("trip update entities nest + order stop_time_updates; empty updates dropped") {
    val ents = FeedAssembler.tripUpdateEntities(tripUpdates, stopTimeUpdates).collect()
    // tu2 has no stop time updates -> dropped (reference #16)
    assert(ents.map(_.getString(0)).toSeq == Seq("tu1"))
    val tu = ents.head.getStruct(1)
    val stus = tu.getSeq[org.apache.spark.sql.Row](tu.fieldIndex("stop_time_update"))
    assert(stus.map(_.getAs[Int]("stop_sequence")) == Seq(1, 2)) // sorted
    assert(stus.head.getAs[org.apache.spark.sql.Row]("departure").getAs[Long]("time") == 1704790800L)
  }

  test("feed message json carries header and strips nulls") {
    val ents = FeedAssembler.tripUpdateEntities(tripUpdates, stopTimeUpdates)
    val json = FeedAssembler.feedMessageJson(ents, "trip_update", timestamp = 1704790000L)
      .first().getString(0)
    assert(json.contains("\"gtfs_realtime_version\":\"2.0\""))
    assert(json.contains("\"incrementality\":\"FULL_DATASET\""))
    assert(json.contains("\"timestamp\":1704790000"))
    assert(json.contains("\"trip_id\":\"t1\""))
    // null vehicle descriptor for tu1 must not appear
    assert(!json.contains("\"vehicle\":{}"))
    assert(!json.contains("license_plate"))
  }

  test("alert entities nest periods/informed entities, sorted by recency") {
    val alerts = Seq(
      ("a1", "CONSTRUCTION", "DETOUR", "http://x", "Header A", "Desc A", null.asInstanceOf[String], null.asInstanceOf[String], "WARNING"),
      ("a2", "ACCIDENT", "DELAY", null.asInstanceOf[String], "Header B", "Desc B", null.asInstanceOf[String], null.asInstanceOf[String], "SEVERE"))
      .toDF("service_alert_id", "cause", "effect", "url", "header_text",
        "description_text", "tts_header_text", "tts_description_text", "severity_level")
    val periods = Seq(("a1", 100L, 200L), ("a2", 500L, 600L))
      .toDF("service_alert_id", "start_timestamp", "end_timestamp")
    val informed = Seq(
      ("a1", null.asInstanceOf[String], "r1", null.asInstanceOf[Integer], null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String], "s1"))
      .toDF("service_alert_id", "agency_id", "route_id", "route_type", "trip_id",
        "trip_route_id", "trip_direction_id", "trip_start_time", "trip_start_date",
        "trip_schedule_relationship", "stop_id")

    val ents = FeedAssembler.alertEntities(alerts, periods, informed).collect()
    // newest active period first (reference #34)
    assert(ents.map(_.getString(0)).toSeq == Seq("a2", "a1"))
    val json = FeedAssembler.feedMessageJson(
      FeedAssembler.alertEntities(alerts, periods, informed), "alert", 1704790000L)
      .first().getString(0)
    assert(json.contains("\"header_text\":{\"translation\":[{\"text\":\"Header A\",\"language\":\"de-DE\"}]}"))
    assert(json.contains("\"active_period\":[{\"start\":100,\"end\":200}]"))
    assert(json.contains("\"route_id\":\"r1\""))
  }

  test("rss channel renders escaped items") {
    val alerts = Seq(("a1", "Tram & Bus <delayed>", "http://x?a=1&b=2", "Body"))
      .toDF("service_alert_id", "header_text", "url", "description_text")
    val xml = XmlRender.rssChannel(alerts, "Alerts", "Service alerts", "de-DE")
      .first().getString(0)
    assert(xml.contains("<title>Tram &amp; Bus &lt;delayed&gt;</title>"))
    assert(xml.contains("<link>http://x?a=1&amp;b=2</link>"))
    assert(xml.contains("<![CDATA[Body]]>"))
    assert(xml.startsWith("<?xml"))
  }
}
