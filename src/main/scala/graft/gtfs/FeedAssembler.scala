package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GTFS-RT FeedMessage assembly (realtime.py:273-481, 726-767):
  * flat realtime tables → nested entity structs → one FeedMessage
  * JSON document. The reference builds dicts row-by-row in Python;
  * here the nesting is collect_list aggregation and the
  * null-stripping the reference does with `if x is not None` falls
  * out of to_json's ignoreNullFields.
  */
object FeedAssembler {

  /** TripDescriptor struct from the flat realtime columns
    * (realtime.py:739-767). Null when every field is null.
    */
  def tripDescriptor: Column = {
    val td = struct(
      col("trip_id").as("trip_id"),
      col("trip_route_id").as("route_id"),
      col("trip_direction_id").as("direction_id"),
      col("trip_start_time").as("start_time"),
      col("trip_start_date").as("start_date"),
      col("trip_schedule_relationship").as("schedule_relationship"))
    when(
      col("trip_id").isNull && col("trip_route_id").isNull &&
        col("trip_direction_id").isNull && col("trip_start_time").isNull &&
        col("trip_start_date").isNull && col("trip_schedule_relationship").isNull,
      lit(null)).otherwise(td)
  }

  /** VehicleDescriptor struct (realtime.py:769-791). */
  def vehicleDescriptor: Column = {
    val vd = struct(
      col("vehicle_id").as("id"),
      col("vehicle_label").as("label"),
      col("vehicle_license_plate").as("license_plate"),
      col("vehicle_wheelchair_accessible").as("wheelchair_accessible"))
    when(
      col("vehicle_id").isNull && col("vehicle_label").isNull &&
        col("vehicle_license_plate").isNull && col("vehicle_wheelchair_accessible").isNull,
      lit(null)).otherwise(vd)
  }

  /** Nested trip-update entities (realtime.py:307-400): one row per
    * trip update with its stop_time_updates collected in sequence
    * order; updates with no stop_time_updates are dropped (see the
    * reference's #16 guard).
    */
  def tripUpdateEntities(tripUpdates: DataFrame, stopTimeUpdates: DataFrame): DataFrame = {
    val stus = stopTimeUpdates
      .groupBy(col("trip_update_id"))
      .agg(sort_array(collect_list(struct(
        col("stop_sequence"),
        struct(
          col("stop_sequence").as("stop_sequence"),
          col("stop_id").as("stop_id"),
          when(col("arrival_time").isNotNull || col("arrival_delay").isNotNull,
            struct(
              col("arrival_time").as("time"),
              col("arrival_delay").as("delay"),
              col("arrival_uncertainty").as("uncertainty"))).as("arrival"),
          when(col("departure_time").isNotNull || col("departure_delay").isNotNull,
            struct(
              col("departure_time").as("time"),
              col("departure_delay").as("delay"),
              col("departure_uncertainty").as("uncertainty"))).as("departure"),
          col("schedule_relationship").as("schedule_relationship")).as("stu")))).as("ordered"))
      .select(col("trip_update_id"), transform(col("ordered"), o => o("stu")).as("stop_time_update"))

    tripUpdates
      .join(stus, Seq("trip_update_id")) // inner: drops updates with no STUs
      .select(
        col("trip_update_id").as("id"),
        struct(
          tripDescriptor.as("trip"),
          vehicleDescriptor.as("vehicle"),
          col("stop_time_update")).as("trip_update"),
        col("trip_start_date"),
        col("trip_start_time"))
      // reference sorts entities by start_date-start_time (see #17)
      .orderBy(col("trip_start_date"), col("trip_start_time"), col("id"))
      .select(col("id"), col("trip_update"))
  }

  /** Nested service-alert entities (realtime.py:623-724), each with
    * active periods and informed entities, sorted by earliest active
    * period descending (see the reference's #34).
    */
  def alertEntities(
      alerts: DataFrame,
      activePeriods: DataFrame,
      informedEntities: DataFrame): DataFrame = {
    def translation(c: Column): Column =
      when(c.isNotNull, struct(array(struct(c.as("text"), lit("de-DE").as("language"))).as("translation")))

    val aps = activePeriods.groupBy(col("service_alert_id"))
      .agg(collect_list(struct(
        col("start_timestamp").as("start"),
        col("end_timestamp").as("end"))).as("active_period"),
        min(col("start_timestamp")).as("earliest_start"))

    val ies = informedEntities.groupBy(col("service_alert_id"))
      .agg(collect_list(struct(
        col("agency_id"),
        col("route_id"),
        col("route_type"),
        col("stop_id"),
        tripDescriptor.as("trip"))).as("informed_entity"))

    alerts
      .join(aps, Seq("service_alert_id"), "left")
      .join(ies, Seq("service_alert_id"), "left")
      .select(
        col("service_alert_id").as("id"),
        struct(
          col("cause"),
          col("effect"),
          translation(col("url")).as("url"),
          translation(col("header_text")).as("header_text"),
          translation(col("tts_header_text")).as("tts_header_text"),
          translation(col("description_text")).as("description_text"),
          translation(col("tts_description_text")).as("tts_description_text"),
          coalesce(col("active_period"), array()).as("active_period"),
          coalesce(col("informed_entity"), array()).as("informed_entity")).as("alert"),
        col("earliest_start"))
      .orderBy(col("earliest_start").desc_nulls_last, col("id"))
      .select(col("id"), col("alert"))
  }

  /** Nested vehicle-position entities (realtime.py:402-481). */
  def vehiclePositionEntities(vehiclePositions: DataFrame): DataFrame =
    vehiclePositions.select(
      col("vehicle_position_id").as("id"),
      struct(
        tripDescriptor.as("trip"),
        vehicleDescriptor.as("vehicle"),
        struct(
          col("position_latitude").as("latitude"),
          col("position_longitude").as("longitude"),
          col("position_bearing").as("bearing"),
          col("position_odometer").as("odometer"),
          col("position_speed").as("speed")).as("position"),
        col("current_stop_sequence").as("current_stop_sequence"),
        col("stop_id").as("stop_id"),
        col("current_status").as("current_status"),
        col("timestamp").as("timestamp"),
        col("congestion_level").as("congestion_level")).as("vehicle_entity"))
      .orderBy(col("id"))

  /** Wrap entity rows into one FeedMessage JSON document
    * (realtime.py:726-737). `timestamp` is supplied by the caller —
    * plans stay deterministic.
    */
  def feedMessageJson(entities: DataFrame, entityCol: String, timestamp: Long): DataFrame =
    entities
      .agg(collect_list(struct(col("id"), col(entityCol))).as("entity"))
      .select(to_json(struct(
        struct(
          lit("2.0").as("gtfs_realtime_version"),
          lit("FULL_DATASET").as("incrementality"),
          lit(timestamp).as("timestamp")).as("header"),
        col("entity")), Map("ignoreNullFields" -> "true")).as("feed_json"))
}
