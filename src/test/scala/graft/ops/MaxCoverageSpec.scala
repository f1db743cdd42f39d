package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C143 greedy max-coverage: hand-traced greedy order, marginal
  * gains, subset-doc exhaustion, and tie-breaks.
  */
class MaxCoverageSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // doc 1: 3 shingles; doc 3: 2 shingles (disjoint); docs 2/4 are
  // strict shingle-subsets of 1/3 respectively
  private def docs = Seq(
    (1L, "w1 w2 w3 w4 w5"),
    (2L, "w1 w2 w3"),
    (3L, "x1 x2 x3 x4"),
    (4L, "x1 x2 x3")
  ).toDF("doc_id", "text")

  test("greedy picks by marginal gain and stops when nothing adds coverage") {
    val out = MaxCoverage.select(docs, col("doc_id"), col("text"), k = 4).collect()
    assert(out.length == 2) // rounds 3+ add nothing: subset docs are exhausted
    assert(out(0).getAs[Long]("doc_id") == 1L && out(0).getAs[Long]("gain") == 3L)
    assert(out(1).getAs[Long]("doc_id") == 3L && out(1).getAs[Long]("gain") == 2L)
    assert(out(0).getAs[Long]("covered_total") == 3L)
    assert(out(1).getAs[Long]("covered_total") == 5L)
  }

  test("equal gains break ties toward the smaller doc_id") {
    val tied = Seq((7L, "a b c"), (5L, "d e f"), (9L, "g h i")).toDF("doc_id", "text")
    val out = MaxCoverage.select(tied, col("doc_id"), col("text"), k = 3).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(5L, 7L, 9L))
    assert(out.map(_.getAs[Long]("gain")).forall(_ == 1L))
  }

  test("k=1 returns the single best coverer") {
    val out = MaxCoverage.select(docs, col("doc_id"), col("text"), k = 1).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("doc_id") == 1L)
    assert(out(0).getAs[Long]("sel_rank") == 1L)
  }

  test("overlapping docs: gain counts only the uncovered shingles") {
    // doc 20 shares shingle "a b c" with doc 10 but adds "b c d"
    val overlap = Seq((10L, "a b c"), (20L, "a b c d")).toDF("doc_id", "text")
    val out = MaxCoverage.select(overlap, col("doc_id"), col("text"), k = 2).collect()
    // doc 20 first (2 shingles), then doc 10 adds nothing -> 1 row
    assert(out.length == 1)
    assert(out(0).getAs[Long]("doc_id") == 20L)
    assert(out(0).getAs[Long]("gain") == 2L)
  }
}
