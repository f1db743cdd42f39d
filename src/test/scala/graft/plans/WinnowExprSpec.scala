package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** D3 parity for the winnowing selection kernel: kernel == the HOF
  * window-min composition, plus the hand-checkable selection set.
  */
class WinnowExprSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def referenceWinnow(h: Column, w: Int): Column =
    when(size(h) === 0, typedLit(Seq.empty[Long]))
      .when(size(h) < w, array(array_min(h)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(h) - (w - 1)),
        i => array_min(slice(h, i, lit(w))))))

  test("hand case: distinct window minima") {
    val df = Seq(Seq(5L, 3L, 9L, 1L, 7L, 2L)).toDF("h")
    val got = df.select(WinnowExpr.winnow(col("h"), 4)).collect()(0).getSeq[Long](0)
    assert(got === Seq(1L)) // all three windows contain the 1
    val got2 = df.select(WinnowExpr.winnow(col("h"), 2)).collect()(0).getSeq[Long](0)
    assert(got2 === Seq(3L, 1L, 2L)) // (5,3) (3,9) (9,1) (1,7) (7,2)
  }

  test("short and empty inputs") {
    val df = Seq(Seq(8L, 6L), Seq.empty[Long]).toDF("h")
    val got = df.select(WinnowExpr.winnow(col("h"), 4)).collect()
      .map(_.getSeq[Long](0))
    assert(got(0) === Seq(6L))
    assert(got(1) === Seq.empty[Long])
  }

  test("property: kernel == HOF composition on random hash streams") {
    val seqGen = Gen.chooseNum(0, 20)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L)))
    val samples = Gen.listOfN(300, seqGen)
      .apply(Gen.Parameters.default, Seed(20260817L)).getOrElse(Nil)
    assert(samples.nonEmpty)
    for (w <- Seq(1, 2, 4, 7)) {
      val bad = samples.toDF("h").select(col("h"),
          WinnowExpr.winnow(col("h"), w).as("kk"),
          referenceWinnow(col("h"), w).as("r"))
        .filter(!(col("kk") <=> col("r")))
        .collect()
      assert(bad.isEmpty, s"w=$w: ${bad.take(3).mkString("\n")}")
    }
  }
}
