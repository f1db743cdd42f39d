package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C146 ABTT anisotropy audit: exact hand-computed projections and
  * variance fractions against a fixed component (bypassing the fit).
  */
class PcaAnisotropySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val mu = Array(0L, 0L)
  private val vAxis = Array(10000L, 0L)

  private def audit(rows: Seq[(Int, Seq[Float])], v: Array[Long] = vAxis) =
    Pca.anisotropyAudit(
      rows.toDF("label", "embedding"), col("embedding"), col("label"), mu, v)
      .collect().map(r => r.getAs[Long]("label") -> r).toMap

  test("vectors along the axis: full variance fraction, signed mean projection") {
    val m = audit(Seq((1, Seq(1f, 0f)), (2, Seq(-1f, 0f))))
    // unitQuant(+-1,0) = (+-10000, 0); dot = +-1e8, cn2 = 1e8, |v|^2 = 1e8
    assert(m(1L).getAs[Long]("mean_dot_q") == 100000000L)
    assert(m(2L).getAs[Long]("mean_dot_q") == -100000000L)
    assert(m(1L).getAs[Long]("var_along_micro") == 1000000L)
    assert(m(2L).getAs[Long]("var_along_micro") == 1000000L)
  }

  test("orthogonal vectors: zero projection, zero variance fraction") {
    val m = audit(Seq((1, Seq(0f, 1f))))
    assert(m(1L).getAs[Long]("mean_dot_q") == 0L)
    assert(m(1L).getAs[Long]("var_along_micro") == 0L)
  }

  test("45-degree vector: variance fraction exactly half") {
    // quantized (7071, 7071): dot^2 = 7071^2*1e8, cn2 = 2*7071^2
    // -> 1e6 * dot^2 / (1e8 * cn2) = 500000 exactly
    val m = audit(Seq((1, Seq(1f, 1f))))
    assert(m(1L).getAs[Long]("var_along_micro") == 500000L)
  }

  test("mixed group: aggregate Rayleigh fraction, averaged drift") {
    val m = audit(Seq((7, Seq(1f, 0f)), (7, Seq(0f, 1f))))
    val r = m(7L)
    assert(r.getAs[Long]("n_vecs") == 2L)
    assert(r.getAs[Long]("mean_dot_q") == 50000000L) // (1e8 + 0) / 2
    assert(r.getAs[Long]("var_along_micro") == 500000L) // 1e16/(1e8*2e8)
  }

  test("zero component vector: fraction undefined (NULL), not a crash") {
    val m = audit(Seq((1, Seq(1f, 0f))), v = Array(0L, 0L))
    val r = m(1L)
    assert(r.isNullAt(r.fieldIndex("var_along_micro")))
  }
}
