package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C126: temporal split semantics — disjoint, exhaustive, strictly
  * ordered train < embargo < test, boundaries exactly where the
  * integer-permille arithmetic puts them.
  */
class TimeSplitSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // 1000 events, 1 per second from epoch 1_000_000s, two types
  private def fixture = (0 until 1000).map { i =>
    (i.toLong, (1000000L + i) * 1000000L, if (i % 3 == 0) "click" else "view")
  }

  private def df = fixture.toDF("event_id", "t_us", "event_type")
    .select(col("event_id"), timestamp_micros(col("t_us")).as("ts"), col("event_type"))

  test("splits are disjoint, exhaustive, and strictly time-ordered") {
    val got = Splits.timeSplit(df, col("ts"), col("event_type"),
        trainPermille = 800, embargoPermille = 50)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    assert(got.map(_._3).sum === 1000L)
    val bySplit = got.groupBy(_._1)
    assert(bySplit.keySet === Set("train", "embargo", "test"))

    val trainMax = bySplit("train").map(_._5).max
    val embMin = bySplit("embargo").map(_._4).min
    val embMax = bySplit("embargo").map(_._5).max
    val testMin = bySplit("test").map(_._4).min
    assert(trainMax < embMin && embMax < testMin)

    // hand-computed boundaries: span = 999s, cutoff = min + 999*800/1000
    // = min + 799.2 -> 799 (integer div) seconds, gap = 999*50/1000 = 49s
    val minUs = 1000000L * 1000000L
    val cutoff = minUs + 999000000L * 800L / 1000L
    val gap = 999000000L * 50L / 1000L
    assert(trainMax < cutoff - gap)
    assert(embMin >= cutoff - gap && embMax < cutoff)
    assert(testMin >= cutoff)
  }

  test("zero embargo yields a pure cutoff split") {
    val got = Splits.timeSplit(df, col("ts"), col("event_type"),
        trainPermille = 500, embargoPermille = 0)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val bySplit = got.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(!bySplit.contains("embargo"))
    assert(bySplit("train") + bySplit("test") === 1000L)
  }

  test("guards reject out-of-range permilles") {
    intercept[IllegalArgumentException] {
      Splits.timeSplit(df, col("ts"), col("event_type"), trainPermille = 1000)
    }
    intercept[IllegalArgumentException] {
      Splits.timeSplit(df, col("ts"), col("event_type"),
        trainPermille = 100, embargoPermille = 200)
    }
  }
}
