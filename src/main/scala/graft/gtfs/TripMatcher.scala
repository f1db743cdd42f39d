package graft.gtfs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed re-expression of the GTFS-RT trip matcher
  * (adapter/gtfsrt.py:190-266).
  *
  * The reference loops over candidate trips per update in Python;
  * here matching is two joins:
  *   1. updates whose trip_id is nominal pass through ("exact");
  *   2. the rest join candidates on (route_id, start_time == first
  *      departure), each candidate validated with a higher-order
  *      `forall` over the update's stop_time_updates against the
  *      candidate's ordered nominal stop list, minimum valid
  *      candidate wins ("matched").
  * Unmatched updates are dropped, like the reference's early returns.
  */
object TripMatcher {

  /** @param updates columns: trip_update_id, trip_id, route_id,
    *                start_time, stop_time_updates:
    *                array<struct<stop_sequence:int, stop_id:string>>
    * @return updates + matched_trip_id + match_method (exact|matched)
    */
  def matchTrips(updates: DataFrame, trips: DataFrame, stopTimes: DataFrame): DataFrame = {
    val nomStops = stopTimes
      .groupBy(col("trip_id"))
      .agg(sort_array(collect_list(struct(col("stop_sequence"), col("stop_id")))).as("ss"))
      .select(col("trip_id"), transform(col("ss"), s => s("stop_id")).as("nom_stops"))

    val firstDep = stopTimes
      .filter(col("stop_sequence") === 1)
      .select(col("trip_id"), col("departure_time"))

    val nominal = trips.select(col("trip_id"), col("route_id"))
      .join(firstDep, Seq("trip_id"))
      .join(nomStops, Seq("trip_id"))

    val nominalIds = nominal.select(col("trip_id"))

    val known = updates
      .join(nominalIds, Seq("trip_id"), "left_semi")
      .withColumn("matched_trip_id", col("trip_id"))
      .withColumn("match_method", lit("exact"))

    val unknown = updates.join(nominalIds, Seq("trip_id"), "left_anti")

    val candidates = unknown.alias("u")
      .join(nominal.alias("n"),
        col("u.route_id") === col("n.route_id") &&
          col("u.start_time") === col("n.departure_time"))
      // every reported stop must sit at its nominal sequence position
      .filter(forall(col("u.stop_time_updates"),
        stu => element_at(col("n.nom_stops"), stu("stop_sequence")) === stu("stop_id")))

    val matched = candidates
      .groupBy(col("u.trip_update_id").as("trip_update_id"))
      .agg(min(col("n.trip_id")).as("matched_trip_id"))

    val unknownMatched = unknown
      .join(matched, Seq("trip_update_id"))
      .withColumn("match_method", lit("matched"))
      .select((updates.columns.map(col) :+ col("matched_trip_id") :+ col("match_method")).toIndexedSeq: _*)

    known.unionByName(unknownMatched)
  }
}
