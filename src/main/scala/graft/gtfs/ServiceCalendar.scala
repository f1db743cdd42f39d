package graft.gtfs

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operation-day service resolution (ddb.py:177-193):
  * services active on a date =
  *   (calendar rows whose [start_date, end_date] covers the date and
  *    whose weekday flag is set)
  *   UNION (calendar_dates exceptions with exception_type=1)
  *   EXCEPT (calendar_dates exceptions with exception_type=2).
  *
  * Set algebra over key columns — distributed distinct/except on the
  * service_id key only, never the full rows.
  */
object ServiceCalendar {

  /** The generic combinator: base ∪ added ∖ removed (all distinct). */
  def resolve(base: DataFrame, added: DataFrame, removed: DataFrame): DataFrame =
    base.union(added).distinct().except(removed)

  private val Fmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** GTFS-typed resolution for one operation day. `calendar` and
    * `calendarDates` follow GtfsSchemas; returns a single-column
    * frame of active `service_id`s.
    */
  def activeServices(calendar: DataFrame, calendarDates: DataFrame, day: LocalDate): DataFrame = {
    val ref = day.format(Fmt).toInt
    val dayName = day.getDayOfWeek.toString.toLowerCase // monday..sunday
    val fromCalendar = calendar
      .filter(col("start_date") <= ref && col("end_date") >= ref && col(dayName) === 1)
      .select("service_id")
    val addedIds = calendarDates
      .filter(col("date") === ref && col("exception_type") === 1)
      .select("service_id")
    val removedIds = calendarDates
      .filter(col("date") === ref && col("exception_type") === 2)
      .select("service_id")
    resolve(fromCalendar, addedIds, removedIds)
  }

  /** Operation-day trips (ddb.py:196-202): trips on active services
    * joined with stop_times (optionally first stop only), ordered.
    * The active-service set is small relative to trips — left_semi
    * join, broadcastable by AQE.
    */
  def operationDayTrips(
      trips: DataFrame,
      stopTimes: DataFrame,
      activeServiceIds: DataFrame,
      fullTrips: Boolean): DataFrame = {
    val activeTrips =
      trips.join(activeServiceIds, Seq("service_id"), "left_semi")
    val st = if (fullTrips) stopTimes else stopTimes.filter(col("stop_sequence") === 1)
    activeTrips
      .join(st, Seq("trip_id"))
      .orderBy(col("trip_id"), col("stop_sequence"))
  }
}
