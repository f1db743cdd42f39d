package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.MatchConfig

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
  *
  * The configurable overload carries the reference's three matching
  * switches (config.py matching section; gtfsrt.py:222-246):
  *   - all three off → any same-(route, start_time) candidate matches
  *     with no stop validation (gtfsrt.py:222-223 `break`);
  *   - match_against_first_stop_id alone → only the stop_sequence==1
  *     update is validated (gtfsrt.py:225-227 `continue`);
  *   - otherwise every update's sequence must be within the nominal
  *     stop count (gtfsrt.py:230-233), match_against_stop_ids fails
  *     the candidate on any stop mismatch (gtfsrt.py:242-245), and
  *     remove_invalid_stop_ids drops mismatching stop_time_updates
  *     from the accepted entity instead (gtfsrt.py:238-240, 249-250).
  */
object TripMatcher {

  /** Default matcher — the strictest mode (every reported stop
    * validated, nothing removed), which q_trip_match oracles.
    */
  def matchTrips(updates: DataFrame, trips: DataFrame, stopTimes: DataFrame): DataFrame =
    matchTrips(updates, trips, stopTimes, MatchConfig.AllStops)

  /** @param updates columns: trip_update_id, trip_id, route_id,
    *                start_time, stop_time_updates:
    *                array<struct<stop_sequence:int, stop_id:string>>
    * @return updates + matched_trip_id + match_method (exact|matched),
    *         with stop_time_updates filtered on matched rows when
    *         cfg.removeInvalidStopIds
    */
  def matchTrips(updates: DataFrame, trips: DataFrame, stopTimes: DataFrame,
      cfg: MatchConfig): DataFrame = {
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

    // nominal stop at the update's sequence position: the reference
    // indexes nominal[max(0, seq-1)] (gtfsrt.py:236-237); `get` is
    // 0-based and null out-of-bounds, so no ANSI index error.
    def nomAt(stu: Column): Column =
      get(col("n.nom_stops"), greatest(lit(0), stu("stop_sequence") - 1))
    def stuMatches(stu: Column): Column = nomAt(stu) <=> stu("stop_id")
    def inBounds(stu: Column): Column =
      stu("stop_sequence") <= size(col("n.nom_stops"))

    val candidateValid: Column =
      if (!cfg.validatesStops) lit(true) // gtfsrt.py:222-223 break
      else if (cfg.firstStopOnlyActive)
        // gtfsrt.py:225-227: sequences != 1 are skipped entirely
        // (including the bounds check — `continue` precedes it)
        forall(col("u.stop_time_updates"),
          stu => (stu("stop_sequence") =!= 1) || (inBounds(stu) && stuMatches(stu)))
      else {
        val bounds = forall(col("u.stop_time_updates"), inBounds(_))
        if (cfg.matchAgainstStopIds)
          bounds && forall(col("u.stop_time_updates"), stuMatches(_))
        else bounds // remove-mode: mismatches are dropped, not fatal
      }

    val candidates = unknown.alias("u")
      .join(nominal.alias("n"),
        col("u.route_id") === col("n.route_id") &&
          col("u.start_time") === col("n.departure_time"))
      .filter(candidateValid)

    val matched = candidates
      .groupBy(col("u.trip_update_id").as("trip_update_id"))
      .agg(min(col("n.trip_id")).as("matched_trip_id"))

    // remove_invalid_stop_ids (when stop mismatches are non-fatal):
    // filter the accepted entity's stop_time_updates against the
    // WINNING candidate's nominal stops (gtfsrt.py:238-240, 249-250).
    // Exact-trip_id updates are never filtered — the reference's
    // known-trips path inserts them untouched (gtfsrt.py:192-201).
    val removeActive = cfg.removeInvalidStopIds && !cfg.matchAgainstStopIds && cfg.validatesStops

    val unknownMatched = {
      val base = unknown.join(matched, Seq("trip_update_id"))
      val withStus =
        if (!removeActive) base
        else base.alias("u")
          .join(nominal.select(col("trip_id").as("matched_trip_id"), col("nom_stops")).alias("n"),
            Seq("matched_trip_id"))
          .withColumn("stop_time_updates",
            filter(col("u.stop_time_updates"), stu =>
              get(col("n.nom_stops"), greatest(lit(0), stu("stop_sequence") - 1)) <=> stu("stop_id")))
      withStus
        .withColumn("match_method", lit("matched"))
        .select((updates.columns.map(col) :+ col("matched_trip_id") :+ col("match_method")).toIndexedSeq: _*)
    }

    known.unionByName(unknownMatched)
  }
}
