package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C128: pairwise source overlap — exact Jaccard is hand-checkable on
  * planted mirrors, the sketch agrees at the extremes (identical
  * sources -> 1000, disjoint -> 0), and every unordered pair appears
  * exactly once.
  */
class SourceOverlapSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // mirror: s1 and s2 share exactly their one document; s3 disjoint
  private def fixture = Seq(
    (1L, "alpha beta gamma delta epsilon", "s1"),
    (2L, "alpha beta gamma delta epsilon", "s2"),
    (3L, "zeta eta theta iota kappa", "s3")
  ).toDF("doc_id", "text", "source")

  test("identical sources score 1000; disjoint sources score 0") {
    val got = SourceOverlap.matrix(fixture, col("text"), col("source"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    assert(got.keySet === Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))

    val (c12, u12, e12, k12) = got(("s1", "s2"))
    // 5 tokens -> 3 distinct 3-shingles, fully shared
    assert((c12, u12, e12, k12) === ((3L, 3L, 1000L, 1000L)))

    val (c13, _, e13, k13) = got(("s1", "s3"))
    assert(c13 === 0L && e13 === 0L && k13 === 0L)
  }

  test("partial overlap: exact Jaccard matches hand count") {
    // s1: shingles {a b c, b c d}; s2: {b c d, c d e} -> inter 1, union 3
    val df = Seq(
      (1L, "a b c d", "s1"),
      (2L, "b c d e", "s2")
    ).toDF("doc_id", "text", "source")
    val r = SourceOverlap.matrix(df, col("text"), col("source")).collect()(0)
    assert(r.getLong(2) === 1L) // n_common
    assert(r.getLong(3) === 3L) // n_union
    assert(r.getLong(4) === 333L) // 1000*1/3
    // sketch is a 16-component estimate of 1/3: must be in (0, 1000)
    assert(r.getLong(5) > 0L && r.getLong(5) < 1000L)
  }

  test("plan: no CartesianProduct; text never reaches the pair join") {
    val plan = SourceOverlap.matrix(fixture, col("text"), col("source"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
