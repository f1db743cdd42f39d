package graft.gtfs

import org.apache.spark.sql.types._

/** The GTFS data model (static + realtime tables), mirroring the
  * reference's table definitions (ddbdef.py:1-260). GTFS id/flag
  * fields stay strings (the spec allows arbitrary ids and the
  * reference stores most flags as TEXT); date fields are yyyymmdd
  * ints; realtime delay/time fields are ints/longs.
  */
object GtfsSchemas {

  private def f(name: String, dt: DataType, nullable: Boolean = true) =
    StructField(name, dt, nullable)

  val agency: StructType = StructType(Seq(
    f("agency_id", StringType, nullable = false),
    f("agency_name", StringType),
    f("agency_url", StringType),
    f("agency_timezone", StringType),
    f("agency_lang", StringType),
    f("agency_phone", StringType),
    f("agency_fare_url", StringType),
    f("agency_email", StringType)))

  val calendar: StructType = StructType(Seq(
    f("service_id", StringType, nullable = false),
    f("monday", IntegerType),
    f("tuesday", IntegerType),
    f("wednesday", IntegerType),
    f("thursday", IntegerType),
    f("friday", IntegerType),
    f("saturday", IntegerType),
    f("sunday", IntegerType),
    f("start_date", IntegerType),
    f("end_date", IntegerType)))

  val calendarDates: StructType = StructType(Seq(
    f("service_id", StringType, nullable = false),
    f("date", IntegerType),
    f("exception_type", IntegerType)))

  val feedInfo: StructType = StructType(Seq(
    f("feed_publisher_name", StringType),
    f("feed_publisher_url", StringType),
    f("feed_lang", StringType),
    f("default_lang", StringType),
    f("feed_start_date", IntegerType),
    f("feed_end_date", IntegerType),
    f("feed_version", StringType),
    f("feed_contact_email", StringType),
    f("feed_contact_url", StringType)))

  val routes: StructType = StructType(Seq(
    f("agency_id", StringType),
    f("route_id", StringType, nullable = false),
    f("route_short_name", StringType),
    f("route_long_name", StringType),
    f("route_desc", StringType),
    f("route_type", IntegerType),
    f("route_url", StringType),
    f("route_color", StringType),
    f("route_text_color", StringType),
    f("route_sort_order", IntegerType),
    f("continuous_pickup", IntegerType),
    f("continuous_drop_off", IntegerType),
    f("network_id", StringType)))

  val shapes: StructType = StructType(Seq(
    f("shape_id", StringType, nullable = false),
    f("shape_pt_lat", DoubleType),
    f("shape_pt_lon", DoubleType),
    f("shape_pt_sequence", IntegerType),
    f("shape_dist_traveled", DoubleType)))

  val stopTimes: StructType = StructType(Seq(
    f("trip_id", StringType, nullable = false),
    f("arrival_time", StringType),
    f("departure_time", StringType),
    f("stop_id", StringType),
    f("location_group_id", StringType),
    f("location_id", StringType),
    f("stop_sequence", IntegerType),
    f("stop_headsign", StringType),
    f("start_pickup_drop_off_window", StringType),
    f("end_pickup_drop_off_window", StringType),
    f("pickup_type", StringType),
    f("drop_off_type", StringType),
    f("continuous_pickup", IntegerType),
    f("continuous_drop_off", IntegerType),
    f("shape_dist_traveled", StringType),
    f("timepoint", IntegerType),
    f("pickup_booking_rule_id", StringType),
    f("drop_off_booking_rule_id", StringType)))

  val stops: StructType = StructType(Seq(
    f("stop_id", StringType, nullable = false),
    f("stop_code", StringType),
    f("stop_name", StringType),
    f("tts_stop_name", StringType),
    f("stop_desc", StringType),
    f("stop_lat", DoubleType),
    f("stop_lon", DoubleType),
    f("zone_id", StringType),
    f("stop_url", StringType),
    f("location_type", StringType),
    f("parent_station", StringType),
    f("stop_timezone", StringType),
    f("wheelchair_boarding", StringType),
    f("level_id", StringType),
    f("platform_code", StringType)))

  val transfers: StructType = StructType(Seq(
    f("from_stop_id", StringType),
    f("to_stop_id", StringType),
    f("from_route_id", StringType),
    f("to_route_id", StringType),
    f("from_trip_id", StringType),
    f("to_trip_id", StringType),
    f("transfer_type", StringType),
    f("min_transfer_time", StringType)))

  val trips: StructType = StructType(Seq(
    f("route_id", StringType, nullable = false),
    f("service_id", StringType, nullable = false),
    f("trip_id", StringType, nullable = false),
    f("trip_headsign", StringType),
    f("trip_short_name", StringType),
    f("direction_id", StringType),
    f("block_id", StringType),
    f("shape_id", StringType),
    f("wheelchair_accessible", StringType),
    f("bikes_allowed", StringType)))

  val realtimeVehiclePositions: StructType = StructType(Seq(
    f("vehicle_position_id", StringType),
    f("trip_id", StringType),
    f("trip_route_id", StringType),
    f("trip_direction_id", StringType),
    f("trip_start_time", StringType),
    f("trip_start_date", StringType),
    f("trip_schedule_relationship", StringType),
    f("vehicle_id", StringType),
    f("vehicle_label", StringType),
    f("vehicle_license_plate", StringType),
    f("vehicle_wheelchair_accessible", StringType),
    f("position_latitude", DoubleType),
    f("position_longitude", DoubleType),
    f("position_bearing", DoubleType),
    f("position_odometer", DoubleType),
    f("position_speed", DoubleType),
    f("current_stop_sequence", IntegerType),
    f("stop_id", StringType),
    f("current_status", StringType),
    f("timestamp", LongType),
    f("congestion_level", StringType),
    f("last_updated_timestamp", TimestampType)))

  val realtimeTripUpdates: StructType = StructType(Seq(
    f("trip_update_id", StringType, nullable = false),
    f("trip_id", StringType),
    f("trip_route_id", StringType),
    f("trip_direction_id", StringType),
    f("trip_start_time", StringType),
    f("trip_start_date", StringType),
    f("trip_schedule_relationship", StringType),
    f("vehicle_id", StringType),
    f("vehicle_label", StringType),
    f("vehicle_license_plate", StringType),
    f("vehicle_wheelchair_accessible", StringType),
    f("timestamp", LongType),
    f("last_updated_timestamp", TimestampType)))

  val realtimeTripStopTimeUpdates: StructType = StructType(Seq(
    f("trip_update_id", StringType, nullable = false),
    f("stop_sequence", IntegerType),
    f("stop_id", StringType),
    f("arrival_time", LongType),
    f("arrival_delay", IntegerType),
    f("arrival_uncertainty", IntegerType),
    f("departure_time", LongType),
    f("departure_delay", IntegerType),
    f("departure_uncertainty", IntegerType),
    f("schedule_relationship", StringType),
    f("last_updated_timestamp", TimestampType)))

  val realtimeServiceAlerts: StructType = StructType(Seq(
    f("service_alert_id", StringType, nullable = false),
    f("cause", StringType),
    f("effect", StringType),
    f("url", StringType),
    f("header_text", StringType),
    f("description_text", StringType),
    f("tts_header_text", StringType),
    f("tts_description_text", StringType),
    f("severity_level", StringType),
    f("last_updated_timestamp", TimestampType)))

  val realtimeAlertActivePeriods: StructType = StructType(Seq(
    f("service_alert_id", StringType, nullable = false),
    f("start_timestamp", LongType),
    f("end_timestamp", LongType),
    f("last_updated_timestamp", TimestampType)))

  val realtimeAlertInformedEntities: StructType = StructType(Seq(
    f("service_alert_id", StringType, nullable = false),
    f("agency_id", StringType),
    f("route_id", StringType),
    f("route_type", IntegerType),
    f("trip_id", StringType),
    f("trip_route_id", StringType),
    f("trip_direction_id", StringType),
    f("trip_start_time", StringType),
    f("trip_start_date", StringType),
    f("trip_schedule_relationship", StringType),
    f("stop_id", StringType),
    f("last_updated_timestamp", TimestampType)))

  val staticTables: Map[String, StructType] = Map(
    "agency" -> agency,
    "calendar_dates" -> calendarDates,
    "calendar" -> calendar,
    "feed_info" -> feedInfo,
    "routes" -> routes,
    "shapes" -> shapes,
    "stop_times" -> stopTimes,
    "stops" -> stops,
    "transfers" -> transfers,
    "trips" -> trips)

  val realtimeTables: Map[String, StructType] = Map(
    "realtime_service_alerts" -> realtimeServiceAlerts,
    "realtime_alert_active_periods" -> realtimeAlertActivePeriods,
    "realtime_alert_informed_entities" -> realtimeAlertInformedEntities,
    "realtime_trip_updates" -> realtimeTripUpdates,
    "realtime_trip_stop_time_updates" -> realtimeTripStopTimeUpdates,
    "realtime_vehicle_positions" -> realtimeVehiclePositions)
}
