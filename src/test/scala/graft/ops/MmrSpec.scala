package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C134: MMR semantics — rank 1 is the pure-relevance argmax, a
  * near-duplicate of a selected item is passed over for a diverse
  * one, lambda=1000 degenerates to relevance top-k, and the loop
  * guards.
  */
class MmrSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // query along e1; 1/2 nearly parallel to it (1 slightly closer),
  // 3 diverse (45 deg), 4 orthogonal
  private def fixture = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 0.01)),
    (2L, Seq(1.0, 0.0, 0.0, 0.02)),
    (3L, Seq(0.7, 0.7, 0.0, 0.0)),
    (4L, Seq(0.0, 1.0, 0.0, 0.0))
  ).toDF("vec_id", "embedding")

  private def query = Seq(Tuple1(Seq(1.0, 0.0, 0.0, 0.0))).toDF("qv")

  test("diverse pick beats the redundant near-twin at moderate lambda") {
    val got = Mmr.select(fixture, col("vec_id"), col("embedding"), query,
        k = 3, lambdaMilli = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got(0)._2 === 1L) // most relevant (ties to smaller id)
    assert(got(1)._2 === 3L) // NOT the near-twin 2: redundancy kicks in
    // round 3: the twin's small penalty (rel ~ sim to pick 1) beats
    // the orthogonal 4's huge similarity to pick 3 — hand-computed
    assert(got(2)._2 === 2L)
  }

  test("lambda = 1000 degenerates to relevance top-k") {
    val got = Mmr.select(fixture, col("vec_id"), col("embedding"), query,
        k = 3, lambdaMilli = 1000)
      .collect().map(_.getLong(1))
    assert(got === Array(1L, 2L, 3L)) // pure cosine order
  }

  test("rel_q of the top pick is ~1e8 (unit cos ~1)") {
    val r = Mmr.select(fixture, col("vec_id"), col("embedding"), query,
      k = 1, lambdaMilli = 700).collect()(0)
    assert(math.abs(r.getLong(2) - 100000000L) < 300000L)
    assert(r.getLong(3) === 700L * r.getLong(2))
  }

  test("prefiltered == exact when the shortlist covers the corpus") {
    val exact = Mmr.select(fixture, col("vec_id"), col("embedding"), query,
      k = 3, lambdaMilli = 500).collect().map(r => (r.getLong(0), r.getLong(1)))
    val pre = Mmr.selectPrefiltered(fixture, col("vec_id"), col("embedding"),
      query, k = 3, lambdaMilli = 500, candN = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pre === exact)
  }

  test("prefiltered restricts picks to the nearest candidates") {
    // candN = 2 keeps only the two query-nearest vectors (1, 2):
    // the diverse 3 can no longer be picked
    val pre = Mmr.selectPrefiltered(fixture, col("vec_id"), col("embedding"),
      query, k = 2, lambdaMilli = 500, candN = 2)
      .collect().map(_.getLong(1)).toSet
    assert(pre === Set(1L, 2L))
  }

  test("guards: k beyond corpus and a multi-row query are rejected") {
    intercept[IllegalArgumentException] {
      Mmr.select(fixture, col("vec_id"), col("embedding"), query, k = 5)
        .collect()
    }
    intercept[IllegalArgumentException] {
      Mmr.select(fixture, col("vec_id"), col("embedding"),
        fixture.select(col("embedding").as("qv")), k = 1)
    }
  }
}
