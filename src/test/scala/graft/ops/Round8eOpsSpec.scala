package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the fifth round-8 operator batch: cross-validated
  * label-noise audit, split-conformal coverage, lift/gains table.
  */
class Round8eOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // -------------------------------------------------------- CrossVal

  /** Separable two-vocabulary fixture with ONE planted wrong label:
    * doc 7 is pure "alpha" text labeled -1.
    */
  private val noisyDocs = (1L to 30L).map { i =>
    // distinct filler per doc: the planted wrong label must not make
    // its class non-separable (identical texts with conflicting
    // labels would cycle the perceptron instead of exposing doc 7)
    val txt = if (i <= 15) s"alpha alpha beta alpha filler$i"
      else s"gamma delta gamma gamma filler$i"
    (i, txt)
  }
  private val noisyLabels = (1L to 30L).map { i =>
    val y = if (i <= 15) 1 else -1
    (i, if (i == 7L) -y else y)
  }

  test("labelNoiseAudit flags the planted wrong label") {
    val audit = CrossVal.labelNoiseAudit(
        noisyDocs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        noisyLabels.toDF("doc_id", "y"), dim = 256, epochs = 3, k = 3)
      .collect()
    assert(audit.length == 30)
    val suspects = audit.filter(_.getBoolean(5)).map(_.getLong(0)).toSet
    assert(suspects.contains(7L))
    // the audit is conservative: clean majority labels stay unflagged
    assert(suspects.size <= 3)
  }

  test("labelNoiseAudit: each doc scored exactly once, in its own fold") {
    val audit = CrossVal.labelNoiseAudit(
        noisyDocs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        noisyLabels.toDF("doc_id", "y"), dim = 256, epochs = 2, k = 3)
      .collect()
    assert(audit.map(_.getLong(0)).distinct.length == 30)
    // fold assignment is the seeded hash — recompute and compare
    val expected = noisyLabels.map(_._1).toDF("doc_id")
      .select(col("doc_id"),
        (Dedup.md5Hash60(concat(lit("noise:"), col("doc_id").cast("string")))
          % 3).cast("int").as("f"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    audit.foreach(r => assert(r.getInt(1) == expected(r.getLong(0))))
    // suspect is exactly pred != y
    audit.foreach(r => assert(r.getBoolean(5) == (r.getInt(4) != r.getInt(2))))
  }

  // -------------------------------------------------------- Conformal

  test("coverageAudit: hand-computed conformal rank and coverage") {
    val cal = (1L to 10L).toDF("s")
    val ev = (1L to 10L).toDF("s")
    val r = Conformal.coverageAudit(cal, ev, alphaMilli = 200L).collect()(0)
    // q_index = ceil(11 * 0.8) = 9 -> q_hat = 9 -> 9/10 covered
    assert(r.getLong(0) == 10L && r.getLong(1) == 9L && r.getLong(2) == 9L)
    assert(r.getLong(3) == 10L && r.getLong(4) == 9L)
    assert(r.getDouble(5) == 0.9 && r.getDouble(6) == 0.8)
  }

  test("coverageAudit: rank past n means an unbounded threshold") {
    val cal = (1L to 10L).toDF("s")
    val ev = Seq(1000000L, -5L).toDF("s")
    val r = Conformal.coverageAudit(cal, ev, alphaMilli = 50L).collect()(0)
    // q_index = ceil(11 * 0.95) = 11 > 10 -> accept everything
    assert(r.getLong(1) == 11L && r.getLong(2) == Conformal.Unbounded)
    assert(r.getLong(4) == 2L && r.getDouble(5) == 1.0)
  }

  test("coverageAudit handles tied calibration scores") {
    val cal = Seq(5L, 5L, 5L, 5L, 5L, 9L, 9L, 9L, 9L, 9L).toDF("s")
    val ev = Seq(5L, 6L, 9L, 10L).toDF("s")
    val r = Conformal.coverageAudit(cal, ev, alphaMilli = 200L).collect()(0)
    // q_index = 9 -> cum(5)=5 < 9, cum(9)=10 >= 9 -> q_hat = 9
    assert(r.getLong(2) == 9L && r.getLong(4) == 3L)
  }

  // -------------------------------------------------------- liftTable

  test("liftTable: hand-computed decile gains") {
    // margins 20..1; positives are the top-5 margins (docs 1..5)
    val scored = (1L to 20L).map(i => (i, 21L - i, i <= 5)).toDF("id", "m", "y")
    val got = RankEval.liftTable(scored, col("id"), col("m"), col("y"), k = 10)
      .orderBy(col("band")).collect()
    assert(got.length == 10)
    got.foreach(r => assert(r.getLong(1) == 2L)) // 2 rows per band
    val pos = got.map(_.getLong(2)).toSeq
    assert(pos == Seq(2L, 2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    val capture = got.map(_.getLong(4)).toSeq
    assert(capture == Seq(400L, 800L, 1000L, 1000L, 1000L,
      1000L, 1000L, 1000L, 1000L, 1000L))
    // lift in band 1: (2/2) / (5/20) = 4.0
    assert(got(0).getLong(5) == 4000L)
    assert(got(9).getLong(5) == 0L)
  }

  test("liftTable with zero positives reports -1 sentinels") {
    val scored = (1L to 10L).map(i => (i, i, false)).toDF("id", "m", "y")
    val got = RankEval.liftTable(scored, col("id"), col("m"), col("y"), k = 5)
      .collect()
    assert(got.forall(r => r.getLong(4) == -1L && r.getLong(5) == -1L))
  }
}
