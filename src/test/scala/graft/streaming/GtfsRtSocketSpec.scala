package graft.streaming

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.gtfs.{GtfsFeed, GtfsFixture}

/** End-to-end over an EXTERNAL transport: a TCP server plays the
  * reference's MQTT broker (realtime.py:149-199 subscribes and drains
  * payloads into the matcher); Spark's socket source consumes raw
  * JSON payload lines → [[UpdateWire.parseUpdates]] →
  * [[GtfsRtPipeline]] match → versioned latest-state store →
  * [[graft.gtfs.FeedAssembler]] — the full loop, with the data
  * arriving over a real network connection across ≥2 micro-batches.
  */
class GtfsRtSocketSpec extends AnyFunSuite with SparkTestBase {

  private lazy val feed = GtfsFeed.loadStatic(spark, GtfsFixture.writeTo().toString)

  private def payload(id: String, tripId: String, ts: Long): String =
    s"""{"trip_update_id":"$id","trip_id":"$tripId","route_id":"r1","start_time":"08:00:00",""" +
      s""""stop_time_updates":[{"stop_sequence":1,"stop_id":"s1"}],"event_ts":$ts}"""

  /** Poll `cond` on the store until it holds or ~30s elapse. */
  private def awaitState(store: GtfsRtPipeline.ParquetStateStore)(
      cond: Map[String, Long] => Boolean): Map[String, Long] = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var snap = Map.empty[String, Long]
    while (System.nanoTime() < deadline && !cond(snap)) {
      Thread.sleep(200)
      snap = store.read(spark).toSeq.flatMap(_.collect()).map(r =>
        r.getAs[String]("trip_update_id") -> r.getAs[Long]("last_updated_ts")).toMap
    }
    snap
  }

  test("socket transport with a kill between micro-batches: parse -> match -> latest state + TTL -> feed") {
    val server = new ServerSocket(0) // the "broker": ephemeral port
    val port = server.getLocalPort
    val stateDir = java.nio.file.Files.createTempDirectory("rt_sock_state").toString
    val store = new GtfsRtPipeline.ParquetStateStore(stateDir)

    // the socket source connects as a client; the feeder loop accepts
    // every (re)connection — a KILLED query's restart connects anew
    @volatile var out: PrintWriter = null
    val feeder = new Thread(() => {
      while (!server.isClosed) {
        try {
          val sock = server.accept()
          out = new PrintWriter(sock.getOutputStream, true)
        } catch { case _: java.io.IOException => () } // server closed
      }
    })
    feeder.setDaemon(true)
    feeder.start()

    def startQuery() = {
      val lines = spark.readStream
        .format("socket")
        .option("host", "localhost").option("port", port)
        .load()
      GtfsRtPipeline.start(UpdateWire.parseUpdates(lines),
        feed.table("trips"), feed.table("stop_times"), store, ttlSeconds = 7200L)
    }
    var q = startQuery()
    try {
      // ---- batch 1: direct match, candidate match, unmatchable, junk
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (out == null && System.nanoTime() < deadline) Thread.sleep(50)
      assert(out != null, "socket source never connected")
      out.println(payload("tu1", "t1", 100L))
      out.println(payload("tu2", "veh-77", 100L))   // candidate-matches t1
      out.println(payload("tu3", "veh-88", 9L).replace("08:00:00", "23:00:00")) // unmatchable
      out.println("""{"not":"an update"}""")         // malformed: dropped by wire parse
      out.println("not json at all")

      val s1 = awaitState(store)(s => s.keySet == Set("tu1", "tu2"))
      assert(s1.keySet == Set("tu1", "tu2"), s"unexpected state: $s1")
      val m1 = store.read(spark).get.collect()
        .map(r => r.getAs[String]("trip_update_id") -> r.getAs[String]("matched_trip_id")).toMap
      assert(m1("tu2") == "t1", "vehicle-keyed update candidate-matched to t1")
      val v1 = store.latestVersion.get

      // ---- CRASH between micro-batches: kill the query, resume with
      // a fresh one over the SAME durable store. The versioned state
      // survives the process boundary — the resumed loop must build on
      // it exactly as an uninterrupted run would.
      q.stop()
      out = null
      q = startQuery()
      val reconnect = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (out == null && System.nanoTime() < reconnect) Thread.sleep(50)
      assert(out != null, "restarted socket source never reconnected")
      assert(store.latestVersion.get == v1, "state untouched across the kill")

      // ---- batch 2 (the resumed query's micro-batch: state version
      // must advance): newer tu1 moves event time past the TTL
      // window — tu2 ages out
      out.println(payload("tu1", "t1", 7301L))
      val s2 = awaitState(store)(s => s.get("tu1").contains(7301L) && !s.contains("tu2"))
      assert(s2 == Map("tu1" -> 7301L),
        s"latest-state kept newest tu1 and TTL-dropped tu2: $s2")
      assert(store.latestVersion.get > v1, "second micro-batch published a new version")

      // ---- the streamed state feeds the assembler, same as file-source
      val state = store.read(spark).get
        .select(col("trip_update_id"), col("matched_trip_id").as("trip_id"),
          col("route_id").as("trip_route_id"),
          lit(null).cast("string").as("trip_direction_id"),
          col("start_time").as("trip_start_time"),
          lit("20240109").as("trip_start_date"),
          lit("SCHEDULED").as("trip_schedule_relationship"),
          lit(null).cast("string").as("vehicle_id"),
          lit(null).cast("string").as("vehicle_label"),
          lit(null).cast("string").as("vehicle_license_plate"),
          lit(null).cast("string").as("vehicle_wheelchair_accessible"))
      val stus = store.read(spark).get
        .select(col("trip_update_id"), explode(col("stop_time_updates")).as("stu"))
        .select(col("trip_update_id"),
          col("stu.stop_sequence").as("stop_sequence"),
          col("stu.stop_id").as("stop_id"),
          lit(null).cast("bigint").as("arrival_time"),
          lit(0).as("arrival_delay"),
          lit(null).cast("int").as("arrival_uncertainty"),
          lit(null).cast("bigint").as("departure_time"),
          lit(null).cast("int").as("departure_delay"),
          lit(null).cast("int").as("departure_uncertainty"),
          lit("SCHEDULED").as("schedule_relationship"))
      val entities = graft.gtfs.FeedAssembler.tripUpdateEntities(state, stus)
      val json = graft.gtfs.FeedAssembler.feedMessageJson(entities, "trip_update", 1704790000L)
        .first().getString(0)
      assert(json.contains("\"id\":\"tu1\"") && !json.contains("\"id\":\"tu2\""))
    } finally {
      q.stop()
      server.close()
    }
  }
}
