package graft.gtfs

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TripMatcherSpec extends AnyFunSuite with SparkTestBase {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private lazy val feed = GtfsFeed.loadStatic(spark, GtfsFixture.writeTo().toString)

  private val updateSchema = StructType(Seq(
    StructField("trip_update_id", StringType),
    StructField("trip_id", StringType),
    StructField("route_id", StringType),
    StructField("start_time", StringType),
    StructField("stop_time_updates", ArrayType(StructType(Seq(
      StructField("stop_sequence", IntegerType),
      StructField("stop_id", StringType)))))))

  private def updates(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), updateSchema)

  test("known trip ids pass through as exact matches") {
    val u = updates(Row("u1", "t1", "r1", "08:00:00",
      Seq(Row(1, "s1"), Row(2, "s2"))))
    val m = TripMatcher.matchTrips(u, feed.table("trips"), feed.table("stop_times"))
      .collect()
    assert(m.length == 1)
    assert(m.head.getAs[String]("matched_trip_id") == "t1")
    assert(m.head.getAs[String]("match_method") == "exact")
  }

  test("unknown trip matched by route + start_time with valid stops") {
    val u = updates(Row("u2", "veh-4711", "r1", "08:00:00",
      Seq(Row(1, "s1"), Row(2, "s2"))))
    val m = TripMatcher.matchTrips(u, feed.table("trips"), feed.table("stop_times"))
      .collect()
    assert(m.length == 1)
    assert(m.head.getAs[String]("matched_trip_id") == "t1")
    assert(m.head.getAs[String]("match_method") == "matched")
  }

  test("unknown trip with mismatching intermediate stop is dropped") {
    val u = updates(Row("u3", "veh-4712", "r1", "08:00:00",
      Seq(Row(1, "s1"), Row(2, "WRONG"))))
    val m = TripMatcher.matchTrips(u, feed.table("trips"), feed.table("stop_times"))
    assert(m.count() == 0)
  }

  test("unknown trip with unknown start time is dropped") {
    val u = updates(Row("u4", "veh-4713", "r1", "23:59:00", Seq(Row(1, "s1"))))
    val m = TripMatcher.matchTrips(u, feed.table("trips"), feed.table("stop_times"))
    assert(m.count() == 0)
  }
}
