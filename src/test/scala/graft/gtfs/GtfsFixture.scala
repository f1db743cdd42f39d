package graft.gtfs

import java.nio.file.{Files, Path}

/** A tiny deterministic GTFS feed on disk for specs: two agencies,
  * three routes, four trips, a station + platform stops, calendar
  * with weekday service and exception dates.
  */
object GtfsFixture {

  val files: Map[String, String] = Map(
    "agency.txt" ->
      """agency_id,agency_name,agency_url,agency_timezone
        |ag1,Agency One,http://one.example,Europe/Berlin
        |ag2,Agency Two,http://two.example,Europe/Berlin
        |""".stripMargin,
    "routes.txt" ->
      """route_id,agency_id,route_short_name,route_type,bogus_extra_col
        |r1,ag1,R1,3,x
        |r2,ag1,R2,3,y
        |r3,ag2,R3,1,z
        |""".stripMargin,
    "trips.txt" ->
      """route_id,service_id,trip_id,trip_headsign,direction_id
        |r1,wk,t1,Downtown,0
        |r1,wk,t2,Uptown,1
        |r2,we,t3,Mall,0
        |r3,wk,t4,Airport,0
        |""".stripMargin,
    "stop_times.txt" ->
      """trip_id,arrival_time,departure_time,stop_id,stop_sequence
        |t1,08:00:00,08:00:00,s1,1
        |t1,08:10:00,08:11:00,s2,2
        |t1,08:20:00,08:20:00,s3,3
        |t2,09:00:00,09:00:00,s3,1
        |t2,09:10:00,09:10:00,s1,2
        |t3,10:00:00,10:00:00,s2,1
        |t3,10:15:00,10:15:00,s4,2
        |t4,11:00:00,11:00:00,s4,1
        |t4,11:30:00,11:30:00,s1,2
        |""".stripMargin,
    "stops.txt" ->
      """stop_id,stop_name,stop_lat,stop_lon,location_type,parent_station
        |s1,Main St,48.1,8.1,0,st1
        |s2,Oak Ave,48.2,8.2,,
        |s3,Pine Rd,48.3,8.3,0,
        |s4,Elm Sq,48.4,8.4,0,
        |st1,Main Station,48.1,8.1,1,
        |st2,Ghost Station,48.9,8.9,1,
        |""".stripMargin,
    "calendar.txt" ->
      """service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date
        |wk,1,1,1,1,1,0,0,20240101,20241231
        |we,0,0,0,0,0,1,1,20240101,20241231
        |""".stripMargin,
    "calendar_dates.txt" ->
      """service_id,date,exception_type
        |we,20240108,1
        |wk,20240108,2
        |""".stripMargin,
    "shapes.txt" ->
      """shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence
        |sh1,48.1,8.1,1
        |""".stripMargin,
    "transfers.txt" ->
      """from_stop_id,to_stop_id,from_route_id,to_route_id,from_trip_id,to_trip_id,transfer_type
        |s1,s2,r1,r2,t1,t3,0
        |s2,s3,r1,r9,t1,t9,0
        |""".stripMargin,
    "feed_info.txt" ->
      """feed_publisher_name,feed_publisher_url,feed_lang
        |Graft,http://graft.example,de
        |""".stripMargin)

  /** Write the fixture feed into a fresh temp dir; returns the dir. */
  def writeTo(): Path = {
    val dir = Files.createTempDirectory("gtfs_fixture")
    files.foreach { case (name, content) =>
      Files.writeString(dir.resolve(name), content)
    }
    dir
  }
}
