package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.gtfs.GtfsFixture

/** End-to-end CLI spec: the reference's documented workflow
  * (__main__.py: load → remove → drop → export / sql / show) driven
  * purely through argv via Main.run, against a parquet database dir.
  */
class MainSpec extends AnyFunSuite with SparkTestBase {

  private def runCli(args: String*): (Int, Seq[String]) = {
    val out = ArrayBuffer.empty[String]
    val code = Main.run(spark, args, out += _)
    (code, out.toSeq)
  }

  test("version prints and exits 0; unknown command and missing args exit 2") {
    val (c0, out0) = runCli("version")
    assert(c0 == 0 && out0 == Seq(Main.Version))
    assert(runCli("frobnicate", "db")._1 == 2)
    assert(runCli()._1 == 2)
    assert(runCli("load")._1 == 2)
    assert(runCli("load", "/tmp/nope_db")._1 == 2) // missing --input
  }

  test("strict options: stray positionals and unknown flags exit 2, nothing runs") {
    val db = Files.createTempDirectory("graft_strict_db").toString
    // stray trailing pattern after a paired flag — must NOT silently
    // run a partial destructive removal
    val (c1, out1) = runCli("remove", db, "-a", "ag2", "extraPattern")
    assert(c1 == 2 && out1.exists(_.contains("stray argument")))
    val (c2, out2) = runCli("remove", db, "--agences", "x")
    assert(c2 == 2 && out2.exists(_.contains("unknown option")))
    assert(!Files.exists(Paths.get(db, "routes.parquet"))) // nothing was written
  }

  test("realtime subcommand renders configured routes from the db's realtime tables") {
    import spark.implicits._
    val db = Files.createTempDirectory("graft_rt_db").toString
    // one alert with an active period in the realtime tables; other
    // realtime tables stay absent (empty-schema fallback)
    Seq(("a1", "CONSTRUCTION", "DETOUR", "http://x", "Header A", "Desc A",
      null.asInstanceOf[String], null.asInstanceOf[String], "WARNING"))
      .toDF("service_alert_id", "cause", "effect", "url", "header_text",
        "description_text", "tts_header_text", "tts_description_text", "severity_level")
      .write.parquet(s"$db/realtime_service_alerts.parquet")
    Seq(("a1", 100L, 200L))
      .toDF("service_alert_id", "start_timestamp", "end_timestamp")
      .write.parquet(s"$db/realtime_alert_active_periods.parquet")

    val cfgFile = Files.createTempFile("graft_rt", ".yaml")
    Files.writeString(cfgFile,
      "app:\n  rss_enabled: true\n  routing:\n    service_alerts_endpoint: /rt/sa.pbf\nrss:\n  title: CLI Alerts\n")
    val out = Files.createTempDirectory("graft_rt_out").toString

    val (code, lines) = runCli("realtime", db, "-c", cfgFile.toString, "-o", out)
    assert(code == 0)
    // configured alert endpoint + default trip/vehicle endpoints + rss
    assert(lines.exists(_.startsWith("/rt/sa.pbf ->")))
    assert(lines.exists(_.startsWith("/gtfs/realtime/trip-updates.pbf ->")))
    assert(lines.exists(_.startsWith("/gtfs/realtime/rss.xml ->")))
    val sa = Files.readAllBytes(Paths.get(out, "rt_sa.pbf"))
    assert(sa.nonEmpty && sa(0) == 0x0a) // FeedMessage header frame
    val rss = new String(Files.readAllBytes(Paths.get(out, "gtfs_realtime_rss.xml")))
    assert(rss.contains("<title>CLI Alerts</title>") && rss.contains("Header A"))
    // missing --output exits 2
    assert(runCli("realtime", db)._1 == 2)
  }

  test("load → remove → export → sql → show workflow from argv") {
    val fixture = GtfsFixture.writeTo().toString
    val db = Files.createTempDirectory("graft_cli_db").toString

    // load
    val (lc, _) = runCli("load", db, "-i", fixture)
    assert(lc == 0)
    assert(Files.exists(Paths.get(db, "routes.parquet")))

    // remove agency ag2 (owns r3/t4) + trip t3 by pattern, one
    // dependent sweep at the end — the reference CLI sequence
    val (rc, _) = runCli("remove", db, "-a", "ag2", "-t", "t3")
    assert(rc == 0)
    val feed = Main.openDb(spark, db)
    assert(feed.table("agency").count() == 1)
    val routes = feed.table("routes").select("route_id")
      .collect().map(_.getString(0)).toSet
    assert(routes == Set("r1", "r2")) // r3 cascaded away with ag2
    val trips = feed.table("trips").select("trip_id")
      .collect().map(_.getString(0)).toSet
    assert(trips == Set("t1", "t2")) // t3 removed, t4 cascaded

    // export to a txt dir
    val outDir = Files.createTempDirectory("graft_cli_export").toString
    val (ec, _) = runCli("export", db, "-o", outDir)
    assert(ec == 0)
    val agencyTxt = Files.readString(Paths.get(outDir, "agency.txt"))
    assert(agencyTxt.contains("ag1") && !agencyTxt.contains("ag2"))

    // sql from a file: two statements, rows of the each emitted
    val sqlFile = Files.createTempFile("graft_cli", ".sql")
    Files.writeString(sqlFile,
      "SELECT count(*) FROM trips;\nSELECT route_id FROM routes ORDER BY route_id;")
    val (sc, sqlOut) = runCli("sql", db, "-f", sqlFile.toString)
    assert(sc == 0)
    assert(sqlOut == Seq("2", "r1", "r2"))

    // show: 2024-01-09 is a Tuesday with wk service active
    val (hc, showOut) = runCli("show", db, "-d", "20240109", "-n", "100")
    assert(hc == 0)
    assert(showOut.head.startsWith("found "))
    assert(showOut.exists(_.contains("t1")))

    // show -o writes a single CSV file with a header
    val csvOut = Paths.get(Files.createTempDirectory("graft_cli_csv").toString, "trips.csv")
    val (oc, _) = runCli("show", db, "-d", "20240109", "-o", csvOut.toString)
    assert(oc == 0)
    val csv = Files.readString(csvOut)
    assert(csv.linesIterator.next().contains("trip_id"))
  }

  test("drop merges a subset database: stops upsert by stop_id, other tables append") {
    val fixture = GtfsFixture.writeTo().toString
    val db = Files.createTempDirectory("graft_cli_db2").toString
    assert(runCli("load", db, "-i", fixture)._1 == 0)

    // subset db: one updated stop (s1 renamed) + one new stop
    import spark.implicits._
    val subsetDb = Files.createTempDirectory("graft_cli_subset").toString
    Seq(("s1", "Main St Renamed"), ("s9", "Brand New"))
      .toDF("stop_id", "stop_name")
      .write.parquet(Paths.get(subsetDb, "stops.parquet").toString)

    assert(runCli("drop", db, "-i", subsetDb)._1 == 0)
    val stops = Main.openDb(spark, db).table("stops")
      .select("stop_id", "stop_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stops("s1") == "Main St Renamed")
    assert(stops("s9") == "Brand New")
    assert(stops.contains("s2")) // untouched original survives

    // unknown strategy is rejected, like an unimportable module
    assert(runCli("drop", db, "-i", subsetDb, "-s", "bogus")._1 == 2)
  }

  test("save/open round-trips over the same database paths (staged swap)") {
    val fixture = GtfsFixture.writeTo().toString
    val db = Files.createTempDirectory("graft_cli_db3").toString
    assert(runCli("load", db, "-i", fixture)._1 == 0)
    // remove reads from <db> and rewrites <db> in one run — the
    // staging swap is what makes this safe
    assert(runCli("remove", db, "-r", "r%")._1 == 0)
    val feed = Main.openDb(spark, db)
    assert(feed.table("routes").count() == 0)
    assert(feed.table("trips").count() == 0)
    assert(feed.table("agency").count() == 2) // agencies not cascaded upward
  }
}
