package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C132: one-pass dispersion — identical vectors -> mean cos ~1,
  * orthogonal -> ~0, opposite -> ~-1; singleton null; no join in the
  * plan.
  */
class EmbeddingDispersionSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("identical, orthogonal, and opposite groups hit the landmarks") {
    val df = Seq(
      (1, Seq(1.0, 0.0)), (1, Seq(1.0, 0.0)),            // cos = 1
      (2, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0)),            // cos = 0
      (3, Seq(1.0, 0.0)), (3, Seq(-1.0, 0.0))            // cos = -1
    ).toDF("label", "embedding")
    val got = EmbeddingPool.dispersion(df, col("label"), col("embedding"), dim = 2)
      .orderBy(col("group")).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(math.abs(got(1) - 1000000L) < 2000L)
    assert(math.abs(got(2)) < 2000L)
    assert(math.abs(got(3) + 1000000L) < 2000L)
  }

  test("singleton group yields null dispersion, not a crash") {
    val df = Seq((7, Seq(0.6, 0.8))).toDF("label", "embedding")
    val r = EmbeddingPool.dispersion(df, col("label"), col("embedding"), dim = 2)
      .collect()(0)
    assert(r.isNullAt(2))
    // a single unit vector's centroid norm is ~1
    assert(math.abs(r.getLong(3) - 1000000L) < 2000L)
  }

  test("plan is join-free: the n^2 pairwise never materializes") {
    val df = Seq((1, Seq(1.0, 0.0))).toDF("label", "embedding")
    val plan = EmbeddingPool.dispersion(df, col("label"), col("embedding"), dim = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(!plan.contains("WindowExec"))
  }
}
