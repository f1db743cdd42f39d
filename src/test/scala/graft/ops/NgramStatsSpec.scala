package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C131: n-gram fingerprint — multiplicity preserved (the boilerplate
  * signal), exact shares, lexical tie-break, TakeOrdered plan.
  */
class NgramStatsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("repeated boilerplate dominates with exact counts and shares") {
    // "all rights reserved" 3x; each doc also has a unique tail gram
    val docs = Seq(
      "all rights reserved alpha",
      "all rights reserved beta",
      "all rights reserved gamma"
    ).toDF("text")
    val got = NgramStats.topNgrams(docs, col("text"), n = 3, k = 2).collect()
    // per doc: grams = (all rights reserved), (rights reserved <x>) -> 6 total
    assert(got(0).getString(0) === "all rights reserved")
    assert(got(0).getLong(1) === 3L)
    assert(got(0).getLong(2) === 500000L) // 3/6
    // rank 2 is the lexically smallest of the count-1 grams
    assert(got(1).getString(0) === "rights reserved alpha")
    assert(got(1).getLong(1) === 1L)
    assert(got(1).getLong(2) === 166666L) // floor(1e6/6)
  }

  test("multiplicity within one document counts every occurrence") {
    val docs = Seq("x y x y x y").toDF("text")
    // grams: (x y x), (y x y), (x y x), (y x y) -> 2 each
    val got = NgramStats.topNgrams(docs, col("text"), n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet === Set(("x y x", 2L), ("y x y", 2L)))
  }

  test("short documents contribute their whole text once") {
    val docs = Seq("one two").toDF("text")
    val got = NgramStats.topNgrams(docs, col("text"), n = 3, k = 5).collect()
    assert(got.length === 1 && got(0).getString(0) === "one two")
  }

  test("plan is TakeOrdered, not a global sort") {
    val docs = Seq("a b c d").toDF("text")
    val plan = NgramStats.topNgrams(docs, col("text"), n = 3, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("WindowExec"))
  }
}
