package graft.gtfs

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AlertIngestSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("alert ingest maps ids, clears unknown refs, drops empty alerts") {
    val alerts = Seq(
      ("a1", "Works on line 1"),
      ("a2", "Unknown refs only"),
      ("a3", "Stop alert")).toDF("service_alert_id", "header_text")
    val informed = Seq(
      ("a1", "ext-r1", null.asInstanceOf[String]), // mapped to r1, valid
      ("a1", "r-unknown", null.asInstanceOf[String]), // invalid selector
      ("a2", "r-unknown", "s-unknown"), // nothing valid -> alert dropped
      ("a3", null.asInstanceOf[String], "s2")) // valid stop
      .toDF("service_alert_id", "route_id", "stop_id")
    val nominalRoutes = Seq("r1", "r2").toDF("route_id")
    val nominalStops = Seq("s1", "s2").toDF("stop_id")
    val routeMap = Seq(("ext-r1", "r1")).toDF("from_id", "to_id")

    val (keptAlerts, keptEntities) = AlertIngest.ingest(
      alerts, informed, nominalRoutes, nominalStops, Some(routeMap), None)

    assert(keptAlerts.select("service_alert_id").collect().map(_.getString(0)).toSet ==
      Set("a1", "a3"))
    val ents = keptEntities.collect().map(r =>
      (r.getAs[String]("service_alert_id"), r.getAs[String]("route_id"), r.getAs[String]("stop_id")))
    assert(ents.toSet == Set(("a1", "r1", null), ("a3", null, "s2")))
  }

  test("vehicle position entities nest descriptors and position") {
    val vp = Seq((
      "vp1", "t1", "r1", "0", "08:00:00", "20240109", "SCHEDULED",
      "veh1", "Bus 1", null.asInstanceOf[String], null.asInstanceOf[String],
      48.1, 8.1, 123.0, null.asInstanceOf[java.lang.Double], 12.5,
      Int.box(3), "s2", "IN_TRANSIT_TO", 1704790000L, "RUNNING_SMOOTHLY"))
      .toDF("vehicle_position_id", "trip_id", "trip_route_id", "trip_direction_id",
        "trip_start_time", "trip_start_date", "trip_schedule_relationship",
        "vehicle_id", "vehicle_label", "vehicle_license_plate", "vehicle_wheelchair_accessible",
        "position_latitude", "position_longitude", "position_bearing", "position_odometer",
        "position_speed", "current_stop_sequence", "stop_id", "current_status",
        "timestamp", "congestion_level")
    val ents = FeedAssembler.vehiclePositionEntities(vp)
    val json = FeedAssembler.feedMessageJson(ents, "vehicle_entity", 1704790001L)
      .first().getString(0)
    assert(json.contains("\"latitude\":48.1"))
    assert(json.contains("\"speed\":12.5"))
    assert(json.contains("\"id\":\"veh1\""))
    assert(!json.contains("odometer")) // null stripped
  }
}
