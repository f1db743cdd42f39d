package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.gtfs.{GtfsFeed, GtfsFixture}

class GtfsRtPipelineSpec extends AnyFunSuite with SparkTestBase {

  private lazy val feed = GtfsFeed.loadStatic(spark, GtfsFixture.writeTo().toString)

  private val stuType = ArrayType(StructType(Seq(
    StructField("stop_sequence", IntegerType),
    StructField("stop_id", StringType))))

  case class Upd(
      trip_update_id: String, trip_id: String, route_id: String,
      start_time: String, stus: Seq[(Int, String)], event_ts: Long)

  private def toDf(us: Seq[Upd]) = {
    val schema = StructType(Seq(
      StructField("trip_update_id", StringType),
      StructField("trip_id", StringType),
      StructField("route_id", StringType),
      StructField("start_time", StringType),
      StructField("stop_time_updates", stuType),
      StructField("event_ts", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(us.map(u =>
        Row(u.trip_update_id, u.trip_id, u.route_id, u.start_time,
          u.stus.map { case (s, id) => Row(s, id) }, u.event_ts))),
      schema)
  }

  test("stream -> match -> latest-state store -> feed end to end") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Int] // driver: ints select pre-staged batches
    val batches = Map(
      1 -> Seq(
        Upd("tu1", "t1", "r1", "08:00:00", Seq(1 -> "s1", 2 -> "s2"), 100L),
        Upd("tu2", "veh-77", "r1", "08:00:00", Seq(1 -> "s1"), 100L), // matches t1
        Upd("tu3", "veh-88", "r1", "23:00:00", Seq(1 -> "s1"), 100L)), // unmatchable
      2 -> Seq(
        Upd("tu1", "t1", "r1", "08:00:00", Seq(1 -> "s1"), 200L))) // newer tu1

    val stateDir = java.nio.file.Files.createTempDirectory("rt_state").toString
    val store = new GtfsRtPipeline.ParquetStateStore(stateDir)

    // feed the staged batch through flatMap of the marker stream
    val stream = input.toDS().toDF("batch_no")
    // materialize per-batch rows via a static lookup join
    val staged = toDf(batches(1)).withColumn("batch_no", lit(1))
      .unionByName(toDf(batches(2)).withColumn("batch_no", lit(2)))
    staged.createOrReplaceTempView("staged_updates")
    val joined = stream.join(staged, "batch_no").drop("batch_no")

    val q = GtfsRtPipeline.start(joined, feed.table("trips"), feed.table("stop_times"), store)
    try {
      input.addData(1); q.processAllAvailable()
      val s1 = store.read(spark).get.collect()
        .map(r => r.getAs[String]("trip_update_id") ->
          (r.getAs[String]("matched_trip_id"), r.getAs[Long]("last_updated_ts"))).toMap
      assert(s1.keySet == Set("tu1", "tu2")) // tu3 dropped (no match)
      assert(s1("tu2")._1 == "t1") // candidate-matched

      input.addData(2); q.processAllAvailable()
      val s2 = store.read(spark).get.collect()
        .map(r => r.getAs[String]("trip_update_id") -> r.getAs[Long]("last_updated_ts")).toMap
      assert(s2("tu1") == 200L) // newer version won
      assert(s2("tu2") == 100L) // untouched entity survives

      // current state feeds the assembler
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
      assert(json.contains("\"id\":\"tu1\"") && json.contains("\"id\":\"tu2\""))

      // same streamed state serves the protobuf wire format: decode
      // the bytes independently and find both entities + header
      import graft.gtfs.ProtoWire
      import graft.gtfs.ProtoWire.{PBytes, PVarint}
      val pbf = graft.gtfs.GtfsRtProto.feedMessagePbf(entities, "trip_update", 1704790000L)
      val msg = ProtoWire.parse(pbf)
      val header = msg.collect { case (1, b: PBytes) => b.fields }.head
      assert(header.collect { case (3, PVarint(v)) => v } == Seq(1704790000L))
      val ids = msg.collect { case (2, b: PBytes) =>
        b.fields.collect { case (1, s: PBytes) => s.utf8 }.head
      }
      assert(ids.toSet == Set("tu1", "tu2"))
    } finally q.stop()
  }

  test("applyBatch with a tag is exactly-once under foreachBatch crash-replay") {
    val stateDir = java.nio.file.Files.createTempDirectory("rt_replay").toString
    val store = new GtfsRtPipeline.ParquetStateStore(stateDir)
    val trips = feed.table("trips")
    val stus = feed.table("stop_times")
    val b1 = toDf(Seq(Upd("tu1", "t1", "r1", "08:00:00", Seq(1 -> "s1"), 100L)))

    GtfsRtPipeline.applyBatch(b1, trips, stus, store, 7200L, tag = Some("ck-0"))
    val v1 = store.latestVersion.get
    val s1 = store.read(spark).get.collect().map(_.getAs[String]("trip_update_id")).toSeq

    // crash-replay: the SAME batch re-applied with the same tag must
    // not publish a second version (the tag committed with v1)
    GtfsRtPipeline.applyBatch(b1, trips, stus, store, 7200L, tag = Some("ck-0"))
    assert(store.latestVersion.get == v1, "replayed batch published nothing")

    // the NEXT batch (new tag) applies normally
    val b2 = toDf(Seq(Upd("tu1", "t1", "r1", "08:00:00", Seq(1 -> "s1"), 200L)))
    GtfsRtPipeline.applyBatch(b2, trips, stus, store, 7200L, tag = Some("ck-1"))
    assert(store.latestVersion.get == v1 + 1)
    assert(store.read(spark).get.collect().map(_.getAs[Long]("last_updated_ts")).toSeq == Seq(200L))
    assert(s1 == Seq("tu1"))
  }

  test("checkpointed restart resumes from committed offsets over the durable store") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("rt_ckpt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rt_ckpt").toString
    val stateDir = java.nio.file.Files.createTempDirectory("rt_ckpt_state").toString
    val store = new GtfsRtPipeline.ParquetStateStore(stateDir)

    def startQuery() = {
      val lines = spark.readStream.schema("value STRING").format("text").load(inDir)
      GtfsRtPipeline.start(UpdateWire.parseUpdates(lines),
        feed.table("trips"), feed.table("stop_times"), store,
        ttlSeconds = 7200L, checkpointDir = Some(ckpt))
    }
    def payload(id: String, ts: Long): String =
      s"""{"trip_update_id":"$id","trip_id":"t1","route_id":"r1","start_time":"08:00:00",""" +
        s""""stop_time_updates":[{"stop_sequence":1,"stop_id":"s1"}],"event_ts":$ts}"""

    Seq(payload("tu1", 100L)).toDF("value").coalesce(1)
      .write.mode("append").text(inDir)
    var q = startQuery()
    try {
      q.processAllAvailable()
      assert(store.read(spark).get.collect().map(_.getAs[Long]("last_updated_ts")).toSeq
        == Seq(100L))
      val v1 = store.latestVersion.get
      q.stop() // kill between micro-batches

      Seq(payload("tu1", 200L)).toDF("value").coalesce(1)
        .write.mode("append").text(inDir)
      q = startQuery() // resume from the SAME checkpoint
      q.processAllAvailable()
      val rows = store.read(spark).get.collect()
      assert(rows.map(_.getAs[Long]("last_updated_ts")).toSeq == Seq(200L),
        "resumed query processed only the new file and merged onto durable state")
      assert(store.latestVersion.get == v1 + 1,
        "exactly one new version for the one new batch (no replay double-merge)")
    } finally q.stop()
  }
}
