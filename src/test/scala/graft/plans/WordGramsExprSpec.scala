package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** D3 parity for the multiplicity-preserving gram kernel (C131's
  * counting path): kernel == the HOF composition it replaces, on the
  * real corpus, adversarial cases, and random strings.
  */
class WordGramsExprSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def referenceGrams(text: Column, k: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  test("kernel == HOF composition on the real documents corpus") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
        WordGramsExpr.grams(col("text"), 3).as("kk"),
        referenceGrams(col("text"), 3).as("r"))
      .filter(!(col("kk") <=> col("r")))
    assert(diff.count() == 0)
  }

  test("kernel == HOF on hand cases across k") {
    val cases = Seq("", " ", "a", "a b", "a b c", "a b c d",
      "x y x y x y", "  Pad  ded\ttabs  ", "UPPER lower MiXeD",
      "ünï cödé mül tï", "repeat repeat repeat repeat")
    for (k <- Seq(1, 2, 3, 5)) {
      val bad = cases.toDF("text").select(col("text"),
          WordGramsExpr.grams(col("text"), k).as("kk"),
          referenceGrams(col("text"), k).as("r"))
        .filter(!(col("kk") <=> col("r")))
        .collect()
      assert(bad.isEmpty, s"k=$k: ${bad.mkString("\n")}")
    }
  }

  test("property: kernel == HOF on random token streams") {
    val tokGen = Gen.oneOf("a", "bb", "Ccc", "d1", "é", "tok~7")
    val strGen = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, tokGen)).map(_.mkString(" "))
    val samples = Gen.listOfN(300, strGen)
      .apply(Gen.Parameters.default, Seed(20260816L)).getOrElse(Nil)
    assert(samples.nonEmpty)
    val bad = samples.toDF("text").select(col("text"),
        WordGramsExpr.grams(col("text"), 3).as("kk"),
        referenceGrams(col("text"), 3).as("r"))
      .filter(!(col("kk") <=> col("r")))
      .collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("multiplicity is preserved where the distinct kernel dedups") {
    val df = Seq("x y x y x y").toDF("text")
    val all = df.select(WordGramsExpr.grams(col("text"), 3)).collect()(0)
      .getSeq[String](0)
    val dst = df.select(WordShinglesExpr.shingles(col("text"), 3)).collect()(0)
      .getSeq[String](0)
    assert(all === Seq("x y x", "y x y", "x y x", "y x y"))
    assert(dst === Seq("x y x", "y x y"))
  }
}
