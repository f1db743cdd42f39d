package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C136: agreement landmarks — identical rankings score tau 1000 and
  * RBO = the full weight mass, reversal scores tau -1000 with a
  * top-weight haircut, and single-common-item queries leave tau null.
  */
class RankAgreementSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val K = 4

  private def arm(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("query_id", "doc_id", "rank")

  test("identical rankings: tau 1000, full overlap, full RBO mass") {
    val a = arm((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L))
    val got = RankAgreement.agreement(a, a, k = K, pMilli = 900).collect()(0)
    assert(got.getLong(1) === 4L) // n_common
    assert(got.getLong(2) === 1000L) // overlap
    assert(got.getLong(3) === 1000L) // tau
    // identical lists: overlap_d = d at every depth -> rbo = sum(w_d)
    val fullMass = RankAgreement.rboWeightsMicro(K, 900).sum
    assert(got.getLong(4) === fullMass)
  }

  test("reversed rankings: tau -1000, RBO well below the full mass") {
    val a = arm((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L))
    val b = arm((1L, 10L, 4L), (1L, 11L, 3L), (1L, 12L, 2L), (1L, 13L, 1L))
    val got = RankAgreement.agreement(a, b, k = K, pMilli = 900).collect()(0)
    assert(got.getLong(3) === -1000L)
    val fullMass = RankAgreement.rboWeightsMicro(K, 900).sum
    assert(got.getLong(4) < fullMass / 2)
    assert(got.getLong(2) === 1000L) // same item set -> full overlap@k
  }

  test("single common item: overlap counts it, tau is null") {
    val a = arm((1L, 10L, 1L), (1L, 11L, 2L))
    val b = arm((1L, 10L, 1L), (1L, 99L, 2L))
    val got = RankAgreement.agreement(a, b, k = K).collect()(0)
    assert(got.getLong(1) === 1L)
    assert(got.isNullAt(3))
  }

  test("weights are a monotone geometric tail") {
    val w = RankAgreement.rboWeightsMicro(10, 900)
    assert(w.head === 99999L) // floor((1-0.9)*1e6): 0.1 is inexact in binary
    assert(w === w.sorted.reverse)
    assert(w.sum <= 1000000L)
  }
}
