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
}
