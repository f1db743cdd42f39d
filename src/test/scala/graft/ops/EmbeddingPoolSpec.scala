package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C127: per-group pooling — hand-computed integer means, unit norm
  * ~1e4, zero-vector guard, and no row-exploding Generate in the
  * plan (the dim-sums shape).
  */
class EmbeddingPoolSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("means and unit vectors match hand computation") {
    val df = Seq(
      (1, Seq(1.0, 0.0, 0.0)),
      (1, Seq(0.0, 1.0, 0.0)),
      (2, Seq(0.5, 0.5, 0.5)),
      (2, Seq(0.5, 0.5, 0.5))
    ).toDF("label", "embedding")
    val got = EmbeddingPool.groupCentroids(df, col("label"), col("embedding"), dim = 3)
      .orderBy(col("group")).collect()

    // group 1: sums (1000, 1000, 0), n=2 -> means (500, 500, 0)
    assert(got(0).getInt(0) === 1)
    assert(got(0).getLong(1) === 2L)
    assert(got(0).getString(2) === "500,500,0")
    // norm2 = 500^2*2 -> unit = floor(1e4 * 500 / sqrt(500000)) = 7071
    assert(got(0).getString(3) === "7071,7071,0")

    // group 2: means (500, 500, 500); unit = floor(1e4/sqrt(3)) = 5773
    assert(got(1).getString(2) === "500,500,500")
    assert(got(1).getString(3) === "5773,5773,5773")
  }

  test("all-zero group renormalizes to zeros, not NaN") {
    val df = Seq((9, Seq(0.0, 0.0))).toDF("label", "embedding")
    val got = EmbeddingPool.groupCentroids(df, col("label"), col("embedding"), dim = 2)
      .collect()
    assert(got(0).getString(2) === "0,0")
    assert(got(0).getString(3) === "0,0")
  }

  test("negative components truncate toward zero like the twin") {
    // first dim sums to -1500, n=2 -> mean -750: java / truncates
    // toward zero (-750, not floor's -750 here but -751 for -1501)
    val df = Seq(
      (3, Seq(-1.0, 0.4)),
      (3, Seq(-0.5, 0.599))
    ).toDF("label", "embedding")
    val got = EmbeddingPool.groupCentroids(df, col("label"), col("embedding"), dim = 2)
      .collect()
    assert(got(0).getString(2) === "-750,499")
  }

  test("plan pools via dim sums — no Generate, no Window") {
    val df = Seq((1, Seq(1.0, 2.0))).toDF("label", "embedding")
    val plan = EmbeddingPool.groupCentroids(df, col("label"), col("embedding"), dim = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"))
    assert(!plan.contains("WindowExec"))
  }
}
