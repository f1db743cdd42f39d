package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FreqSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def topOf(rows: Seq[Row]): Seq[(String, Long)] =
    rows.map(r => (r.getString(0), r.getLong(1)))

  test("guaranteed heavy hitters survive with counts within n/k of truth") {
    // 1000 rows: "a" x 500, "b" x 300, tail of 200 distinct singletons
    val data = (Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ (1 to 200).map(i => s"t$i")).toDF("x")
      .repartition(8) // force partial/merge across partitions
    val res = data.select(FreqSketch.freqItems(col("x"), k = 16)).first()
      .getSeq[Row](0)
    val top = topOf(res)
    val asMap = top.toMap
    val n = 1000.0
    // items with true count > n/k MUST be present; counts undercount by <= n/k
    assert(asMap.contains("a") && asMap.contains("b"))
    assert(asMap("a") <= 500 && asMap("a") >= 500 - n / 16)
    assert(asMap("b") <= 300 && asMap("b") >= 300 - n / 16)
    // output sorted by count desc
    assert(top.head._1 == "a" && top(1)._1 == "b")
  }

  test("per-group summaries on real data surface the dominant language per source") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.01", "documents")
    val freq = docs.groupBy(col("source"))
      .agg(FreqSketch.freqItems(col("lang"), k = 8).as("langs"))
      .collect().map(r => r.getString(0) -> topOf(r.getSeq[Row](1))).toMap
    val exact = docs.groupBy(col("source"), col("lang")).count()
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(r => (r.getString(1), r.getLong(2))).sortBy(-_._2) }
    exact.foreach { case (source, langs) =>
      // the true most-frequent language is the sketch's first item
      // (few distinct langs << k, so MG is exact here)
      assert(freq(source).head == langs.head, s"source $source")
    }
  }

  test("plan shows partial/merge object aggregation") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.01", "documents")
    val plan = docs.groupBy(col("source"))
      .agg(FreqSketch.freqItems(col("lang")).as("f"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_graft_freq_items"),
      s"plan:\n$plan")
  }
}
