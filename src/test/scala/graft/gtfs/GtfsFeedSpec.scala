package graft.gtfs

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GtfsFeedSpec extends AnyFunSuite with SparkTestBase {

  private lazy val feed = GtfsFeed.loadStatic(spark, GtfsFixture.writeTo().toString)

  test("loadStatic aligns schema: unknown columns dropped, missing columns null") {
    val routes = feed.table("routes")
    assert(routes.columns.toSeq == GtfsSchemas.routes.fieldNames.toSeq)
    assert(!routes.columns.contains("bogus_extra_col"))
    assert(routes.count() == 3)
    // missing column present as null
    assert(routes.filter(col("route_long_name").isNull).count() == 3)
    // typed: route_type is int
    assert(routes.schema("route_type").dataType.typeName == "integer")
  }

  test("removeAgencies cascades through routes/trips/stop_times/stops/calendar") {
    val after = feed.removeAgencies("ag2")
    assert(after.table("agency").count() == 1)
    assert(after.table("routes").select("route_id").collect().map(_.getString(0)).toSet == Set("r1", "r2"))
    assert(after.table("trips").select("trip_id").collect().map(_.getString(0)).toSet == Set("t1", "t2", "t3"))
    // t4's stop_times gone
    assert(after.table("stop_times").filter(col("trip_id") === "t4").count() == 0)
    // all remaining stops still referenced; ghost station (no children) removed
    val stops = after.table("stops").select("stop_id").collect().map(_.getString(0)).toSet
    assert(!stops.contains("st2"))
    assert(stops.contains("st1")) // still has child s1
    // transfer rows referencing dropped route r9/trip t9 removed
    assert(after.table("transfers").count() == 1)
  }

  test("station whose children were all cascade-removed is removed too") {
    // removing every agency empties the feed, stations included
    // (the reference's sequential DELETEs: plain stops first, then
    // stations against the remaining stops)
    val after = feed.removeAgencies("ag%")
    assert(after.table("stops").count() == 0)
    assert(after.table("trips").count() == 0)
    assert(after.table("calendar").count() == 0)
  }

  test("station cascade: multi-level hierarchy + pre-delete snapshot semantics") {
    // Mirrors ddb.py:342 — one DELETE whose subquery scans ALL stops
    // surviving the plain-stop pass, including stations: a station
    // parenting another station survives, and a station whose only
    // "child" is a station deleted in the SAME statement also survives
    // (the subquery sees the pre-delete snapshot).
    val dir = java.nio.file.Files.createTempDirectory("gtfs_station_chain")
    Map(
      "agency.txt" -> "agency_id,agency_name,agency_url,agency_timezone\nag1,A,http://a,Europe/Berlin\n",
      "routes.txt" -> "route_id,agency_id,route_short_name,route_type\nr1,ag1,R1,3\n",
      "trips.txt" -> "route_id,service_id,trip_id\nr1,wk,t1\n",
      "stop_times.txt" -> "trip_id,arrival_time,departure_time,stop_id,stop_sequence\nt1,08:00:00,08:00:00,s1,1\n",
      "stops.txt" ->
        ("stop_id,stop_name,location_type,parent_station\n" +
          "s1,Kept Stop,0,stA\n" +
          "s2,Orphan Stop,0,stGone\n" +
          "stA,Station,1,stMega\n" +
          "stMega,Meta Station,1,\n" +
          "stGone,Childless Station,1,stOrphanParent\n" +
          "stOrphanParent,Snapshot Survivor,1,\n"),
      "calendar.txt" -> "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\nwk,1,1,1,1,1,0,0,20240101,20241231\n"
    ).foreach { case (n, c) => java.nio.file.Files.writeString(dir.resolve(n), c) }
    val after = GtfsFeed.loadStatic(spark, dir.toString).removeDependentObjects()
    val stops = after.table("stops").select("stop_id").collect().map(_.getString(0)).toSet
    assert(stops == Set("s1", "stA", "stMega", "stOrphanParent"))
  }

  test("station cascade: NULL parent_station column keeps every station (NOT IN semantics)") {
    // When stops.txt has no parent_station column at all, the loader
    // null-fills it; the reference's `stop_id NOT IN (SELECT
    // parent_station FROM stops)` is then never TRUE (NULL in the set),
    // so no station is ever deleted.
    val dir = java.nio.file.Files.createTempDirectory("gtfs_null_parent")
    Map(
      "agency.txt" -> "agency_id,agency_name,agency_url,agency_timezone\nag1,A,http://a,Europe/Berlin\n",
      "routes.txt" -> "route_id,agency_id,route_short_name,route_type\nr1,ag1,R1,3\n",
      "trips.txt" -> "route_id,service_id,trip_id\nr1,wk,t1\n",
      "stop_times.txt" -> "trip_id,arrival_time,departure_time,stop_id,stop_sequence\nt1,08:00:00,08:00:00,s1,1\n",
      "stops.txt" ->
        ("stop_id,stop_name,location_type\n" +
          "s1,Kept Stop,0\n" +
          "stLonely,Unreferenced Station,1\n")
    ).foreach { case (n, c) => java.nio.file.Files.writeString(dir.resolve(n), c) }
    val after = GtfsFeed.loadStatic(spark, dir.toString).removeDependentObjects()
    val stops = after.table("stops").select("stop_id").collect().map(_.getString(0)).toSet
    assert(stops == Set("s1", "stLonely"))
  }

  test("removeTrips by pattern keeps unrelated objects") {
    val after = feed.removeTrips("t1")
    assert(after.table("trips").count() == 3)
    assert(after.table("stop_times").filter(col("trip_id") === "t1").count() == 0)
  }

  test("removeRoutes cascades and keeps sibling routes of the same agency") {
    val after = feed.removeRoutes("r1")
    assert(after.table("routes").select("route_id").collect().map(_.getString(0)).toSet ==
      Set("r2", "r3"))
    assert(after.table("trips").select("trip_id").collect().map(_.getString(0)).toSet ==
      Set("t3", "t4"))
    // wk service still used by t4 -> calendar row survives
    assert(after.table("calendar").select("service_id").collect().map(_.getString(0)).toSet ==
      Set("wk", "we"))
  }

  test("empty-feed edges: rss over no alerts, export of empty tables") {
    import spark.implicits._
    val noAlerts = Seq.empty[(String, String, String, String)]
      .toDF("service_alert_id", "header_text", "url", "description_text")
    val xml = XmlRender.rssChannel(noAlerts, "T", "D", "de-DE").first().getString(0)
    assert(xml.contains("<channel>") && xml.endsWith("</channel></rss>"))

    val emptied = feed.removeAgencies("ag%")
    val out = java.nio.file.Files.createTempDirectory("gtfs_empty_out")
    emptied.exportStatic(out.toString)
    val reloaded = GtfsFeed.loadStatic(spark, out.toString)
    assert(reloaded.table("trips").count() == 0)
  }

  test("activeServices resolves calendar range + weekday + exceptions") {
    // 2024-01-08 is a Monday: wk matches calendar but is removed by
    // exception; we is added by exception
    val ids = feed.activeServices(LocalDate.of(2024, 1, 8))
      .collect().map(_.getString(0)).toSet
    assert(ids == Set("we"))
    // a regular Tuesday: only wk
    val tue = feed.activeServices(LocalDate.of(2024, 1, 9))
      .collect().map(_.getString(0)).toSet
    assert(tue == Set("wk"))
  }

  test("nominalOperationDayTrips joins trips with first stop times") {
    val trips = feed.nominalOperationDayTrips(LocalDate.of(2024, 1, 9), fullTrips = false)
    val rows = trips.select("trip_id", "stop_id").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSet == Set(("t1", "s1"), ("t2", "s3"), ("t4", "s4")))
    val full = feed.nominalOperationDayTrips(LocalDate.of(2024, 1, 9), fullTrips = true)
    assert(full.count() == 7) // t1:3 + t2:2 + t4:2
  }

  test("monitorTrips flags realtime availability") {
    import spark.implicits._
    val rt = Seq(("tu1", "t1", java.sql.Timestamp.valueOf("2024-01-09 08:05:00")))
      .toDF("trip_update_id", "trip_id", "last_updated_timestamp")
    val mon = feed.monitorTrips(LocalDate.of(2024, 1, 9), rt).df
    val byTrip = mon.select("trip_id", "realtime_available").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(byTrip == Map("t1" -> true, "t2" -> false, "t4" -> false))
    // ordered by departure time
    assert(mon.select("start_time").collect().map(_.getString(0)).toSeq ==
      Seq("08:00:00", "09:00:00", "11:00:00"))
    // realtimeOnly filter
    assert(feed.monitorTrips(LocalDate.of(2024, 1, 9), rt).realtimeOnly.df.count() == 1)
  }

  test("dropSubset upserts stops and appends other tables") {
    import spark.implicits._
    val subStops = Seq(("s1", "Main St RENAMED"), ("s9", "Brand New"))
      .toDF("stop_id", "stop_name")
    val subRoutes = Seq(("r9", "ag1", "R9", 3)).toDF("route_id", "agency_id", "route_short_name", "route_type")
    val subset = GtfsFeed(spark, Map(
      "stops" -> GtfsLake.alignToSchema(subStops, GtfsSchemas.stops),
      "routes" -> GtfsLake.alignToSchema(subRoutes, GtfsSchemas.routes)))
    val merged = feed.dropSubset(subset)
    assert(merged.table("stops").count() == 7) // 6 + 1 new
    val renamed = merged.table("stops").filter(col("stop_id") === "s1")
      .select("stop_name").first().getString(0)
    assert(renamed == "Main St RENAMED")
    // s1's lat survives (null delta column falls back to base)
    val lat = merged.table("stops").filter(col("stop_id") === "s1")
      .select("stop_lat").first().getDouble(0)
    assert(lat == 48.1)
    assert(merged.table("routes").count() == 4)
  }

  test("sql passthrough sees all tables as views") {
    val n = feed.sql("SELECT count(*) AS n FROM trips JOIN routes ON trips.route_id = routes.route_id")
      .first().getLong(0)
    assert(n == 4)
  }

  test("loadStatic accepts quoted commas and embedded newlines like csv.reader") {
    val dir = java.nio.file.Files.createTempDirectory("gtfs_quoted")
    java.nio.file.Files.writeString(dir.resolve("stops.txt"),
      "stop_id,stop_name,location_type,parent_station\n" +
        "s1,\"Main St, Platform 1\",0,\n" +
        "s2,\"Upper\nSquare\",0,\n")
    val f = GtfsFeed.loadStatic(spark, dir.toString)
    val names = f.table("stops").select("stop_id", "stop_name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(names("s1") == "Main St, Platform 1")
    assert(names("s2") == "Upper\nSquare")
  }

  test("sql passthrough registers views once per feed instance") {
    val f = feed
    assert(f.sql("SELECT count(*) AS n FROM agency").first().getLong(0) >= 1)
    // a dropped view stays dropped on the next sql() call on the SAME
    // instance — proof the guard skipped re-registration
    spark.catalog.dropTempView("agency")
    intercept[Exception] { f.sql("SELECT count(*) AS n FROM agency").first() }
    // a different feed instance re-registers everything
    val f2 = f.copy()
    assert(f2.sql("SELECT count(*) AS n FROM agency").first().getLong(0) >= 1)
  }

  test("exportStatic roundtrips through a directory and a zip") {
    val outDir = java.nio.file.Files.createTempDirectory("gtfs_out")
    feed.exportStatic(outDir.toString)
    val reloaded = GtfsFeed.loadStatic(spark, outDir.toString)
    assert(reloaded.table("trips").count() == feed.table("trips").count())
    assert(reloaded.table("stops").count() == feed.table("stops").count())

    val zipPath = outDir.resolve("feed.zip").toString
    feed.exportStatic(zipPath)
    val fromZip = GtfsFeed.loadStaticZip(spark, zipPath)
    assert(fromZip.table("stop_times").count() == feed.table("stop_times").count())
    assert(fromZip.table("agency").select("agency_id").collect().map(_.getString(0)).toSet ==
      Set("ag1", "ag2"))
  }

  test("dedupHeadersLastWins: >=2 ordinals renamed last-wins; single suffixed column untouched") {
    import spark.implicits._
    // Spark-dedup'd duplicated header: route_short_name{1,2} and no base
    val dup = Seq(("r1", "A", "B")).toDF("route_id", "route_short_name1", "route_short_name2")
    val fixed = GtfsLake.dedupHeadersLastWins(dup, GtfsSchemas.routes)
    assert(fixed.columns.contains("route_short_name"))
    assert(fixed.select("route_short_name").first().getString(0) == "B") // LAST occurrence wins
    // a feed legitimately shipping ONE suffixed column (no base, no
    // sibling ordinal) is NOT a Spark dedup artifact — leave it alone
    val single = Seq(("r1", "X")).toDF("route_id", "route_short_name2")
    val kept = GtfsLake.dedupHeadersLastWins(single, GtfsSchemas.routes)
    assert(!kept.columns.contains("route_short_name"))
    assert(kept.columns.contains("route_short_name2"))
  }
}
