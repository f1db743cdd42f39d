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

  // -- matching-config modes (gtfsrt.py:222-250) --------------------

  import graft.util.MatchConfig

  private def mismatching = updates(Row("u5", "veh-4714", "r1", "08:00:00",
    Seq(Row(1, "s1"), Row(2, "WRONG"))))

  test("all switches off: candidate accepted with no stop validation") {
    val cfg = MatchConfig(matchFirstStopOnly = false, matchAgainstStopIds = false,
      removeInvalidStopIds = false)
    val m = TripMatcher.matchTrips(mismatching, feed.table("trips"), feed.table("stop_times"), cfg)
      .collect()
    assert(m.length == 1 && m.head.getAs[String]("matched_trip_id") == "t1")
    // nothing removed
    assert(m.head.getAs[scala.collection.Seq[Row]]("stop_time_updates").map(_.getString(1)) == Seq("s1", "WRONG"))
  }

  test("first-stop-only: intermediate mismatch ignored, first-stop mismatch fatal") {
    val cfg = MatchConfig(matchFirstStopOnly = true, matchAgainstStopIds = false,
      removeInvalidStopIds = false)
    val ok = TripMatcher.matchTrips(mismatching, feed.table("trips"), feed.table("stop_times"), cfg)
      .collect()
    assert(ok.length == 1 && ok.head.getAs[String]("match_method") == "matched")
    val badFirst = updates(Row("u6", "veh-4715", "r1", "08:00:00",
      Seq(Row(1, "WRONG"), Row(2, "s2"))))
    assert(TripMatcher.matchTrips(badFirst, feed.table("trips"), feed.table("stop_times"), cfg)
      .count() == 0)
  }

  test("remove_invalid_stop_ids: candidate survives, mismatching updates dropped") {
    val cfg = MatchConfig.Default // first=true, stopIds=false, remove=true
    val m = TripMatcher.matchTrips(mismatching, feed.table("trips"), feed.table("stop_times"), cfg)
      .collect()
    assert(m.length == 1 && m.head.getAs[String]("matched_trip_id") == "t1")
    assert(m.head.getAs[scala.collection.Seq[Row]]("stop_time_updates").map(_.getString(1)) == Seq("s1"))
  }

  test("remove mode: out-of-bounds sequence still fails the candidate") {
    val u = updates(Row("u7", "veh-4716", "r1", "08:00:00",
      Seq(Row(1, "s1"), Row(99, "s2"))))
    assert(TripMatcher.matchTrips(u, feed.table("trips"), feed.table("stop_times"),
      MatchConfig.Default).count() == 0)
  }

  test("exact-trip_id path never filters stop_time_updates, in any mode") {
    val u = updates(Row("u8", "t1", "r1", "08:00:00",
      Seq(Row(1, "s1"), Row(2, "WRONG"))))
    val m = TripMatcher.matchTrips(u, feed.table("trips"), feed.table("stop_times"),
      MatchConfig.Default).collect()
    assert(m.length == 1 && m.head.getAs[String]("match_method") == "exact")
    assert(m.head.getAs[scala.collection.Seq[Row]]("stop_time_updates").map(_.getString(1)) == Seq("s1", "WRONG"))
  }
}
