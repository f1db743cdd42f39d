package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** D3 parity for the unit-quantization kernel: kernel == the
  * l2Normalize + floor(x·scale) composition it replaces, on the real
  * embeddings, hand landmarks, and random vectors — including the
  * float-input widening path.
  */
class UnitQuantExprSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def referenceForm(c: Column): Column =
    transform(graft.functions.VectorFunctions.l2Normalize(c),
      x => floor(x * 10000L).cast("bigint"))

  test("kernel == composition on the real float embeddings") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val diff = emb.select(
        UnitQuantExpr.unitQuant(col("embedding")).as("kk"),
        referenceForm(col("embedding")).as("r"))
      .filter(!(col("kk") <=> col("r")))
    assert(diff.count() == 0)
  }

  test("hand landmarks (exactly representable cases) + composition parity") {
    // axis vectors: norm exactly 1.0, quotients exact
    val df = Seq(Seq(-1.0, 0.0), Seq(0.0, 2.0), Seq(0.5, 0.0)).toDF("v")
    val got = df.select(UnitQuantExpr.unitQuant(col("v"))).collect()
      .map(_.getSeq[Long](0))
    assert(got(0) === Seq(-10000L, 0L))
    assert(got(1) === Seq(0L, 10000L))
    assert(got(2) === Seq(10000L, 0L))
    // non-exact cases must agree with the composition bit-for-bit
    val tricky = Seq(Seq(3.0, 4.0), Seq(0.6, 0.8), Seq(1.0, 1.0, 1.0)).toDF("v")
    val bad = tricky.select(
        UnitQuantExpr.unitQuant(col("v")).as("kk"),
        referenceForm(col("v")).as("r"))
      .filter(!(col("kk") <=> col("r"))).collect()
    assert(bad.isEmpty)
  }

  test("property: kernel == composition on random nonzero double vectors") {
    // the all-zero vector is outside the parity domain: the ANSI
    // composition throws DIVIDE_BY_ZERO there, while the kernel
    // returns zeros (pinned below) — strictly safer for callers
    val vecGen = Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-5.0, 5.0)))
      .suchThat(v => v.exists(_ != 0.0))
    val samples = Gen.listOfN(300, vecGen)
      .apply(Gen.Parameters.default, Seed(20260818L)).getOrElse(Nil)
      .filter(_.exists(_ != 0.0))
    assert(samples.nonEmpty)
    val bad = samples.toDF("v").select(col("v"),
        UnitQuantExpr.unitQuant(col("v")).as("kk"),
        referenceForm(col("v")).as("r"))
      .filter(!(col("kk") <=> col("r")))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("all-zero vector yields zeros, not an ANSI divide error") {
    val got = Seq(Seq(0.0, 0.0)).toDF("v")
      .select(UnitQuantExpr.unitQuant(col("v"))).collect()(0).getSeq[Long](0)
    assert(got === Seq(0L, 0L))
  }
}
