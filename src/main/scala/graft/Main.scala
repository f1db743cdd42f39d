package graft

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.gtfs.{GtfsFeed, GtfsLake, GtfsSchemas}

/** CLI entry point mirroring the reference's `__main__.py` subcommand
  * surface (__main__.py:28-121: version / load / remove / drop /
  * export / sql / show) so a reference user can drive the same
  * workflow from argv via spark-submit. The "database" positional is
  * a directory of parquet tables — the lake analog of the reference's
  * single-file .duckdb — one `<db>/<table>.parquet` per GTFS table,
  * written via per-table staging + swap so a command can read and
  * rewrite the same database in one run.
  *
  * Divergences from the reference, by design:
  *  - `realtime` (the uvicorn serving shell) is out of SURVEY §2
  *    scope; the data path it serves exists as GtfsRtPipeline.
  *  - `sql -f file` runs each statement over the registered table
  *    views and prints the last statement's rows; Spark SQL has no
  *    UPDATE on views, so mutating statements belong to `remove`/
  *    `drop` (which is what the reference CLI uses them for).
  */
object Main {

  val Version = "1.0.0"

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.getOrCreate(s"local[$cpus]", cpus)
    val code = try run(spark, args.toSeq, Console.out.println(_))
    finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** Testable core: runs one subcommand, returns a process exit code.
    * `emit` receives every line the CLI would print.
    */
  def run(spark: SparkSession, args: Seq[String], emit: String => Unit): Int = {
    args.headOption match {
      case None => emit(usage); 2
      case Some("version") => emit(Version); 0
      case Some(cmd) =>
        args.tail.headOption match {
          case None => emit(s"$cmd: missing DATABASE argument"); emit(usage); 2
          case Some(db) =>
            val opts =
              try parseOpts(args.drop(2))
              catch {
                case e: IllegalArgumentException =>
                  emit(s"$cmd: ${e.getMessage}"); emit(usage); return 2
              }
            cmd match {
              case "load"   => cmdLoad(spark, db, opts, emit)
              case "remove" => cmdRemove(spark, db, opts, emit)
              case "drop"   => cmdDrop(spark, db, opts, emit)
              case "export" => cmdExport(spark, db, opts, emit)
              case "sql"    => cmdSql(spark, db, opts, emit)
              case "show"   => cmdShow(spark, db, opts, emit)
              case "realtime" => cmdRealtime(spark, db, opts, emit)
              case other    => emit(s"unknown command: $other"); emit(usage); 2
            }
        }
    }
  }

  private val usage: String =
    """usage: graft.Main <command> DATABASE [options]
      |  version
      |  load   DATABASE -i|--input <dir-or-zip>
      |  remove DATABASE [-a|--agencies PAT]... [-r|--routes PAT]... [-t|--trips PAT]...
      |  drop   DATABASE [-i|--inputs SUBSET_DB]... [-s|--strategy match_stop_id]
      |  export DATABASE -o|--output <dir-or-zip>
      |  sql    DATABASE [-f|--files SQLFILE]...
      |  show   DATABASE -d|--date YYYYMMDD [-n|--num-results N] [-f|--full-trips BOOL] [-o|--output CSV]
      |  realtime DATABASE [-c|--config CONFIG_YAML] -o|--output DIR""".stripMargin

  /** click-style options: every option may repeat; values collect in
    * order. Short and long forms normalize to the long name.
    */
  private val OptNames = Map(
    "-i" -> "inputs", "--input" -> "inputs", "--inputs" -> "inputs",
    "-a" -> "agencies", "--agencies" -> "agencies",
    "-r" -> "routes", "--routes" -> "routes",
    "-t" -> "trips", "--trips" -> "trips",
    "-s" -> "strategy", "--strategy" -> "strategy",
    "-o" -> "output", "--output" -> "output",
    // -f is the shared short form of both --files (sql) and
    // --full-trips (show), exactly like the reference CLI; normalize
    // all three to the NEUTRAL key "f" so neither long name masquerades
    // as the other at the read sites
    "-f" -> "f", "--files" -> "f", "--full-trips" -> "f",
    "-d" -> "date", "--date" -> "date",
    "-n" -> "num-results", "--num-results" -> "num-results",
    "-c" -> "config", "--config" -> "config")

  /** Strict parse: every token must be a KNOWN flag followed by a
    * value. A stray positional, a dangling flag, or a typo'd option
    * raises instead of being silently dropped — `remove db -a pat
    * extra` must NOT run a partial destructive removal and report
    * success.
    */
  private def parseOpts(args: Seq[String]): Map[String, Seq[String]] =
    args.grouped(2).foldLeft(Map.empty[String, Seq[String]]) {
      case (acc, Seq(flag, value)) =>
        val key = OptNames.getOrElse(flag,
          throw new IllegalArgumentException(s"unknown option: $flag"))
        acc.updated(key, acc.getOrElse(key, Seq.empty) :+ value)
      case (_, Seq(dangling)) =>
        throw new IllegalArgumentException(s"option without value (or stray argument): $dangling")
      case (acc, _) => acc
    }

  // ---- database directory persistence -----------------------------

  /** Open a parquet database dir as a feed; absent tables are empty
    * (the reference's CREATE TABLE IF NOT EXISTS on connect).
    */
  def openDb(spark: SparkSession, db: String): GtfsFeed = {
    val tables = GtfsSchemas.staticTables.map { case (name, schema) =>
      val p = Paths.get(db, s"$name.parquet")
      val df =
        if (Files.exists(p))
          GtfsLake.alignToSchema(spark.read.parquet(p.toString), schema)
        else
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      name -> df
    }
    GtfsFeed(spark, tables)
  }

  /** Persist a feed into the database dir. ALL tables stage first,
    * then all swap in, so a feed whose plans READ `<db>/<t>.parquet`
    * can be saved back over the same paths — the cascade plans make
    * one table's plan read OTHER tables' files (trips scans routes),
    * so no old file may be deleted until every stage write has
    * drained every old table.
    */
  def saveDb(feed: GtfsFeed, db: String): Unit = {
    Files.createDirectories(Paths.get(db))
    val staged = feed.tables.map { case (name, df) =>
      val stage = Paths.get(db, s"_stage_$name.parquet")
      df.write.mode("overwrite").parquet(stage.toString)
      name -> stage
    }
    staged.foreach { case (name, stage) =>
      val target = Paths.get(db, s"$name.parquet")
      deleteRecursively(target)
      Files.move(stage, target)
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))

  // ---- subcommands -------------------------------------------------

  private def cmdLoad(spark: SparkSession, db: String,
      opts: Map[String, Seq[String]], emit: String => Unit): Int =
    opts.get("inputs").flatMap(_.headOption) match {
      case None => emit("load: missing --input"); 2
      case Some(in) =>
        val feed =
          if (in.toLowerCase.endsWith(".zip")) GtfsFeed.loadStaticZip(spark, in)
          else GtfsFeed.loadStatic(spark, in)
        saveDb(feed, db)
        emit(s"loaded $in into $db")
        0
    }

  private def cmdRemove(spark: SparkSession, db: String,
      opts: Map[String, Seq[String]], emit: String => Unit): Int = {
    var feed = openDb(spark, db)
    // per-pattern removal WITHOUT cascading, one dependent-object
    // sweep at the end — the reference's exact sequence
    // (__main__.py:44-53)
    opts.getOrElse("agencies", Seq.empty).foreach(p => feed = feed.removeAgencies(p, cascade = false))
    opts.getOrElse("routes", Seq.empty).foreach(p => feed = feed.removeRoutes(p, cascade = false))
    opts.getOrElse("trips", Seq.empty).foreach(p => feed = feed.removeTrips(p, cascade = false))
    feed = feed.removeDependentObjects()
    saveDb(feed, db)
    emit(s"removed matching objects from $db")
    0
  }

  private def cmdDrop(spark: SparkSession, db: String,
      opts: Map[String, Seq[String]], emit: String => Unit): Int = {
    val strategy = opts.get("strategy").flatMap(_.headOption).getOrElse("match_stop_id")
    if (strategy != "match_stop_id") {
      emit(s"drop: unknown strategy '$strategy' (supported: match_stop_id)"); return 2
    }
    var feed = openDb(spark, db)
    opts.getOrElse("inputs", Seq.empty).foreach { subsetDb =>
      feed = feed.dropSubset(openDb(spark, subsetDb))
    }
    saveDb(feed, db)
    emit(s"dropped ${opts.getOrElse("inputs", Seq.empty).size} subset(s) into $db")
    0
  }

  private def cmdExport(spark: SparkSession, db: String,
      opts: Map[String, Seq[String]], emit: String => Unit): Int =
    opts.get("output").flatMap(_.headOption) match {
      case None => emit("export: missing --output"); 2
      case Some(out) =>
        openDb(spark, db).exportStatic(out)
        emit(s"exported $db to $out")
        0
    }

  private def cmdSql(spark: SparkSession, db: String,
      opts: Map[String, Seq[String]], emit: String => Unit): Int = {
    val feed = openDb(spark, db)
    opts.getOrElse("f", Seq.empty).foreach { f =>
      val text = Files.readString(Paths.get(f))
      text.split(";").map(_.trim).filter(_.nonEmpty).foreach { stmt =>
        val result = feed.sql(stmt)
        result.collect().foreach(r => emit(r.mkString(",")))
      }
    }
    0
  }

  private def cmdShow(spark: SparkSession, db: String,
      opts: Map[String, Seq[String]], emit: String => Unit): Int =
    opts.get("date").flatMap(_.headOption) match {
      case None => emit("show: missing --date"); 2
      case Some(d) =>
        val day = LocalDate.parse(d, DateTimeFormatter.BASIC_ISO_DATE)
        val fullTrips = opts.get("f").flatMap(_.headOption).exists(_.toBoolean)
        val numResults = opts.get("num-results").flatMap(_.headOption).map(_.toInt).getOrElse(200)
        val trips = openDb(spark, db).nominalOperationDayTrips(day, fullTrips)
        opts.get("output").flatMap(_.headOption) match {
          case Some(out) =>
            // single CSV file, like polars write_csv (__main__.py:103)
            val stage = Files.createTempDirectory("graft_show")
            trips.coalesce(1).write.mode("overwrite").option("header", "true").csv(stage.toString)
            val part = Files.list(stage).iterator().asScala
              .find(_.getFileName.toString.startsWith("part-"))
            part.foreach(p => Files.move(p, Paths.get(out),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING))
            deleteRecursively(stage)
          case None =>
            val rows = trips.limit(numResults).collect()
            emit(s"found ${rows.length} ($numResults shown) results")
            rows.foreach(r => emit(r.mkString(",")))
        }
        0
    }

  /** Open the database's REALTIME tables (absent → empty, like
    * openDb). Kept separate from GtfsFeed, which models the static
    * dataset.
    */
  def openRealtimeTables(spark: SparkSession, db: String): Map[String, org.apache.spark.sql.DataFrame] =
    GtfsSchemas.realtimeTables.map { case (name, schema) =>
      val p = Paths.get(db, s"$name.parquet")
      val df =
        if (Files.exists(p))
          GtfsLake.alignToSchema(spark.read.parquet(p.toString), schema)
        else
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      name -> df
    }

  /** One-shot realtime serve (__main__.py's `realtime` subcommand
    * loads the YAML config and mounts the server; the transport shell
    * is out of scope, so this renders every configured route once
    * into --output and prints the routing table). Config-wired:
    * routing endpoints, RSS gating, response caching all honor the
    * YAML (graft.util.GraftConfig).
    */
  private def cmdRealtime(spark: SparkSession, db: String,
      opts: Map[String, Seq[String]], emit: String => Unit): Int =
    opts.get("output").flatMap(_.headOption) match {
      case None => emit("realtime: missing --output"); 2
      case Some(out) =>
        val config = opts.get("config").flatMap(_.headOption) match {
          case Some(f) => graft.util.GraftConfig.fromFile(f)
          case None => graft.util.GraftConfig.defaults
        }
        val rt = openRealtimeTables(spark, db)
        val app = new graft.gtfs.RealtimeApp(
          config,
          () => graft.gtfs.FeedAssembler.alertEntities(
            rt("realtime_service_alerts"),
            rt("realtime_alert_active_periods"),
            rt("realtime_alert_informed_entities")),
          () => graft.gtfs.FeedAssembler.tripUpdateEntities(
            rt("realtime_trip_updates"),
            rt("realtime_trip_stop_time_updates")),
          () => graft.gtfs.FeedAssembler.vehiclePositionEntities(
            rt("realtime_vehicle_positions")))
        Files.createDirectories(Paths.get(out))
        app.routes.toSeq.sortBy(_._1).foreach { case (endpoint, render) =>
          val bytes = render()
          val file = Paths.get(out, endpoint.split('/').filter(_.nonEmpty).mkString("_"))
          Files.write(file, bytes)
          emit(s"$endpoint -> $file (${bytes.length} bytes)")
        }
        0
    }
}
