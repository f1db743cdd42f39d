package graft.gtfs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** A1 ingest-robustness conformance: real-world GTFS zips ship with
  * UTF-8 BOM-prefixed headers, quoted fields holding embedded commas
  * AND newlines, missing optional tables, and duplicate header
  * columns (reference csvddb.py:6-78 tolerates these by parsing with
  * Python's csv module and blacklisting unknown header positions).
  * Every loader — loadStatic, loadStaticZip, GtfsZipCorpus — must
  * take the same mess.
  */
class GtfsIngestRobustnessSpec extends AnyFunSuite with SparkTestBase {

  private val Bom = "\uFEFF"

  /** A deliberately-messy feed: BOM on stops.txt, quoted embedded
    * comma + newline in stop names, duplicate header column in
    * routes.txt, most optional tables absent.
    */
  private def writeMessyFeed(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    def put(name: String, body: String): Unit =
      Files.write(Paths.get(dir, name), body.getBytes(StandardCharsets.UTF_8))
    put("stops.txt",
      Bom + "stop_id,stop_name,stop_lat,stop_lon\n" +
        "s1,\"Main St, Center\",1.5,2.5\n" +
        "s2,\"Two\nLine Name\",3.5,4.5\n")
    // duplicate header column (route_short_name twice): last wins
    put("routes.txt",
      "route_id,route_short_name,route_short_name,route_type\n" +
        "r1,R1,R1B,3\n")
    put("agency.txt",
      "agency_id,agency_name,unknown_extra_column\n" +
        "a1,Agency One,ignore-me\n")
    put("trips.txt",
      "route_id,service_id,trip_id\n" +
        "r1,svc1,t1\n")
    // calendar/calendar_dates/feed_info/shapes/stop_times/transfers
    // intentionally absent
  }

  private def zipOf(dir: String, zipPath: String, prefix: String = ""): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(Paths.get(zipPath)))
    try {
      Files.list(Paths.get(dir)).forEach { p =>
        zos.putNextEntry(new ZipEntry(prefix + p.getFileName.toString))
        zos.write(Files.readAllBytes(p))
        zos.closeEntry()
      }
    } finally zos.close()
  }

  private def assertMessyFeed(feed: GtfsFeed): Unit = {
    val stops = feed.tables("stops")
      .select("stop_id", "stop_name", "stop_lat").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    // BOM stripped: the first header parses as stop_id, not ﻿stop_id
    assert(stops.map(_._1).toSeq == Seq("s1", "s2"))
    // quoted embedded comma and newline survive as field content
    assert(stops(0)._2 == "Main St, Center")
    assert(stops(1)._2 == "Two\nLine Name")
    assert(stops(0)._3 == 1.5)
    // duplicate header column: LAST occurrence wins (DictReader rule)
    val routes = feed.tables("routes")
      .select("route_id", "route_short_name", "route_type").collect()
    assert(routes.length == 1)
    assert(routes(0).getString(0) == "r1")
    assert(routes(0).getString(1) == "R1B")
    assert(routes(0).getInt(2) == 3)
    // unknown extra columns dropped, schema columns null-filled
    val agency = feed.tables("agency").collect()
    assert(agency.length == 1)
    assert(!feed.tables("agency").columns.contains("unknown_extra_column"))
    // missing optional tables load as EMPTY, schema intact
    assert(feed.tables("calendar").count() == 0)
    assert(feed.tables("calendar").columns.contains("service_id"))
    assert(feed.tables("stop_times").count() == 0)
  }

  test("loadStatic ingests a messy feed directory") {
    val dir = Files.createTempDirectory("messy_feed").toString
    writeMessyFeed(dir)
    assertMessyFeed(GtfsFeed.loadStatic(spark, dir))
  }

  test("loadStaticZip ingests a messy feed zip (entries under a subdir)") {
    val dir = Files.createTempDirectory("messy_zip_src").toString
    writeMessyFeed(dir)
    val zip = Files.createTempDirectory("messy_zip").toString + "/feed.zip"
    zipOf(dir, zip, prefix = "gtfs/")
    assertMessyFeed(GtfsFeed.loadStaticZip(spark, zip))
  }

  test("GtfsZipCorpus.readTable takes the same mess, distributed") {
    val dir = Files.createTempDirectory("messy_corpus_src").toString
    writeMessyFeed(dir)
    val zip = Files.createTempDirectory("messy_corpus").toString + "/feed.zip"
    zipOf(dir, zip)
    val stops = graft.sources.GtfsZipCorpus.readTable(spark, Seq(zip), "stops")
      .select("stop_id", "stop_name").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(stops.map(_._1).toSeq == Seq("s1", "s2"))
    assert(stops(0)._2 == "Main St, Center")
    assert(stops(1)._2 == "Two\nLine Name")
    val routes = graft.sources.GtfsZipCorpus.readTable(spark, Seq(zip), "routes")
      .select("route_id", "route_short_name").collect()
    assert(routes.length == 1 && routes(0).getString(1) == "R1B")
    // missing table -> empty frame with the full schema
    val cal = graft.sources.GtfsZipCorpus.readTable(spark, Seq(zip), "calendar")
    assert(cal.count() == 0 && cal.columns.contains("service_id"))
  }

  test("CLI workflow ingests the messy zip end-to-end (load -> show db)") {
    val dir = Files.createTempDirectory("messy_cli_src").toString
    writeMessyFeed(dir)
    val zip = Files.createTempDirectory("messy_cli").toString + "/feed.zip"
    zipOf(dir, zip, prefix = "gtfs/")
    val db = Files.createTempDirectory("messy_cli_db").toString
    val code = graft.Main.run(spark, Seq("load", db, "-i", zip), _ => ())
    assert(code == 0)
    val stops = spark.read.parquet(s"$db/stops.parquet")
      .select("stop_id", "stop_name").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(stops.map(_._1).toSeq == Seq("s1", "s2"))
    assert(stops(1)._2 == "Two\nLine Name")
    val routes = spark.read.parquet(s"$db/routes.parquet").collect()
    assert(routes.length == 1)
  }
}
