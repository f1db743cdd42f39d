package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C133: the winnowing guarantee — any shared token run of length
  * >= w+k-1 yields a shared fingerprint — plus df-anchoring and the
  * text-stays-in-row plan shape.
  */
class WinnowingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val K = 3
  private val W = 4
  // guarantee threshold: w + k - 1 = 6 shared tokens

  test("a shared 6-token run is always caught; disjoint docs never pair") {
    val shared = "lorem ipsum dolor sit amet consectetur"
    val docs = Seq(
      (1L, s"prefix one two $shared"),
      (2L, s"$shared suffix alpha beta"),
      (3L, "completely different words nothing common here at all")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.candidatePairs(docs, col("doc_id"), col("text"),
        k = K, w = W, maxDf = 10, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("hot boilerplate fingerprints are df-excluded") {
    // 12 IDENTICAL docs: every selected fingerprint has df = 12 >
    // maxDf = 10, so nothing pairs — boilerplate floods don't turn
    // the candidate stage quadratic
    val docs = (1 to 12).map(i =>
      (i.toLong, "shared footer common line end all same here now"))
      .toDF("doc_id", "text")
    val pairs = Winnowing.candidatePairs(docs, col("doc_id"), col("text"),
      k = K, w = W, maxDf = 10, minShared = 1)
    assert(pairs.count() === 0L)
    // df within bounds (maxDf = 12): all 66 pairs appear
    val loose = Winnowing.candidatePairs(docs, col("doc_id"), col("text"),
      k = K, w = W, maxDf = 12, minShared = 1)
    assert(loose.count() === 66L)
  }

  test("n_shared counts distinct shared fingerprints exactly") {
    val a = "aa bb cc dd ee ff gg hh"
    val docs = Seq((1L, a), (2L, a)).toDF("doc_id", "text")
    val fpsPerDoc = Winnowing.fingerprints(docs, col("doc_id"), col("text"), K, W)
      .groupBy(col("doc_id")).count().collect().map(_.getLong(1)).distinct
    assert(fpsPerDoc.length === 1)
    val got = Winnowing.candidatePairs(docs, col("doc_id"), col("text"),
      k = K, w = W, maxDf = 10, minShared = 1).collect()
    assert(got.length === 1)
    assert(got(0).getLong(2) === fpsPerDoc(0)) // identical docs share all
  }

  test("plan: fingerprint explode only — text never reaches a shuffle") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = Winnowing.candidatePairs(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("WindowExec"))
  }
}
