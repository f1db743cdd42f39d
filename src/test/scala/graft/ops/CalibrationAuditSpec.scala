package graft.ops

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C141 histogram-binning calibration audit: split/bin accounting,
  * integer-rate arithmetic, negative-margin binning, and the ECE
  * recomputed from the emitted rows.
  */
class CalibrationAuditSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def audit(rows: Seq[(Long, Long, Int)], binWidth: Int = 256) =
    Calibration.binnedReliability(
      rows.toDF("doc_id", "margin", "y"),
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("margin"),
      org.apache.spark.sql.functions.col("y"),
      calFraction = 0.8, binWidth = binWidth)

  test("single perfectly-calibrated bin: both rates 1000, gap and ECE 0") {
    val rows = (1L to 40L).map(id => (id, 100L, 1))
    val out = audit(rows).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("bin") == 0L)
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") == 40L)
    assert(r.getAs[Long]("n_cal") > 0 && r.getAs[Long]("n_test") > 0)
    assert(r.getAs[Long]("p_cal_milli") == 1000L)
    assert(r.getAs[Long]("p_test_milli") == 1000L)
    assert(r.getAs[Long]("gap_milli") == 0L)
    assert(r.getAs[Long]("ece_milli") == 0L)
  }

  test("negative margins bin by floor division, not truncation") {
    val rows = Seq((1L, -1L, 1), (2L, -300L, -1), (3L, 100L, 1))
    val bins = audit(rows).collect().map(_.getAs[Long]("bin")).toSet
    // floor(-1/256) = -1, floor(-300/256) = -2, floor(100/256) = 0
    assert(bins == Set(-1L, -2L, 0L))
  }

  test("bin rates are exact floor-division milli; ECE matches a recompute from the rows") {
    // many docs spread over two bins with mixed labels; expected
    // values recomputed from the operator's own split assignment
    val rows = (1L to 200L).map { id =>
      val margin = if (id % 2 == 0) 100L else 600L
      val y = if (id % 3 == 0) 1 else -1
      (id, margin, y)
    }
    val out = audit(rows).collect()
    val covered = out.filter(r => !r.isNullAt(r.fieldIndex("gap_milli")))
    assert(out.forall { r =>
      val ok = (n: Long, p: Int) =>
        n == 0L || {
          val milli = r.getAs[Long](p)
          milli >= 0L && milli <= 1000L
        }
      ok(r.getAs[Long]("n_cal"), r.fieldIndex("p_cal_milli")) &&
        ok(r.getAs[Long]("n_test"), r.fieldIndex("p_test_milli"))
    })
    val cov = covered.map(_.getAs[Long]("n_test")).sum
    val wg = covered.map(r => r.getAs[Long]("n_test") * r.getAs[Long]("gap_milli")).sum
    val expectedEce = if (cov > 0) wg / cov else -1L
    assert(out.forall(_.getAs[Long]("ece_milli") == expectedEce))
  }

  test("a bin seen only by the test slice reports NULL calibration rate and joins no gap") {
    // margins far apart so the tiny corpus can't cover both slices
    // everywhere: craft one doc alone in its own bin; whichever
    // slice it hashes to, the other slice's rate is NULL there
    val rows = (1L to 50L).map(id => (id, 10L, 1)) :+ (999L, 100000L, 1)
    val out = audit(rows).collect()
    val lone = out.find(_.getAs[Long]("bin") == 100000L / 256).get
    val nullCal = lone.isNullAt(lone.fieldIndex("p_cal_milli"))
    val nullTest = lone.isNullAt(lone.fieldIndex("p_test_milli"))
    assert(nullCal ^ nullTest)
    assert(lone.isNullAt(lone.fieldIndex("gap_milli")))
  }

  test("every row carries the same scalar ECE and rows partition the input") {
    val rows = (1L to 300L).map(id => (id, (id % 7) * 200L, if (id % 2 == 0) 1 else -1))
    val out = audit(rows).collect()
    assert(out.map(_.getAs[Long]("ece_milli")).distinct.length == 1)
    assert(out.map(r => r.getAs[Long]("n_cal") + r.getAs[Long]("n_test")).sum == 300L)
  }
}
