package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SaltingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("salted join equals the unsalted join") {
    // a skewed large side: 1000 rows on one hot key, a few elsewhere
    val large = ((1 to 1000).map(i => (i.toLong, "hot")) ++
      Seq((2000L, "cold1"), (2001L, "cold2"))).toDF("row_id", "k")
    val small = Seq(("hot", 1), ("cold1", 2), ("cold2", 3), ("unused", 4)).toDF("k", "v")

    val salted = Salting.saltedJoin(large, small, "k", buckets = 8, distinguishing = col("row_id"))
    val plain = large.join(small, "k")
    assert(salted.count() == plain.count())
    assert(salted.select(sum(col("v"))).first().getLong(0) ==
      plain.select(sum(col("v"))).first().getLong(0))
    // hot key spread over multiple salt buckets pre-join
    val spread = large.filter(col("k") === "hot")
      .select(Salting.saltFrom(8, col("row_id")).as("s")).distinct().count()
    assert(spread > 1)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = ((1 to 500).map(i => ("hot", i.toLong)) ++ Seq(("cold", 7L))).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val salted = Salting.saltedAgg(df, "k", buckets = 4, distinguishing = col("v"),
      partialAggs = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAggs = Seq(sum("ps").as("s"), sum("pn").as("n")))
    val d = direct.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val s = salted.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(d == s)
  }
}
