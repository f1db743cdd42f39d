package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C130: Heaps fit — exponent separates saturating vocabulary
  * (template flood, beta→0) from always-novel tokens (id spam,
  * beta→1), totals are exact, and the plan has no global window.
  */
class HeapsFitSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("id spam fits beta ~ 1 with perfect linearity") {
    // every token unique: V(n) = n exactly -> beta = 1, corr = 1
    val docs = (1 to 64).map(i => (i.toLong, s"tok${i}a tok${i}b tok${i}c"))
      .toDF("doc_id", "text")
    val r = HeapsFit.fit(docs, col("doc_id"), col("text")).collect()(0)
    assert(r.getLong(1) === 192L) // n_terms
    assert(r.getLong(2) === 192L) // n_tokens
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-9)
  }

  test("template flood fits beta ~ 0") {
    // constant vocabulary: V(n) = 3 for every checkpoint -> beta = 0
    val docs = (1 to 64).map(i => (i.toLong, "the same words"))
      .toDF("doc_id", "text")
    val r = HeapsFit.fit(docs, col("doc_id"), col("text")).collect()(0)
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 192L)
    assert(math.abs(r.getDouble(3)) < 1e-9)
  }

  test("mixed growth lands strictly between the extremes") {
    // half repeated scaffold, half novel ids
    val docs = (1 to 64).map(i => (i.toLong, s"common scaffold here uniq$i"))
      .toDF("doc_id", "text")
    val r = HeapsFit.fit(docs, col("doc_id"), col("text")).collect()(0)
    val beta = r.getDouble(3)
    assert(beta > 0.1 && beta < 1.0)
  }

  test("plan has no unpartitioned global window") {
    val docs = (1 to 16).map(i => (i.toLong, s"a b c$i")).toDF("doc_id", "text")
    val plan = HeapsFit.fit(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"))
    assert(!plan.contains("CartesianProduct"))
  }
}
