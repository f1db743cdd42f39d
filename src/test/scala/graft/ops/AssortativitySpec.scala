package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C144 degree assortativity: hand-computed Pearson values on known
  * graphs and the degree-regular NULL case.
  */
class AssortativitySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def one(edges: Seq[(Long, Long)]) = {
    val rows = Assortativity.global(edges.toDF("src", "dst")).collect()
    assert(rows.length == 1)
    rows(0)
  }

  test("star K1,3 is perfectly disassortative: r = -1") {
    val r = one(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("triangle with a pendant: r = -20/28 = -0.7143") {
    val r = one(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Double]("assortativity") == -0.7143)
  }

  test("a degree-regular graph (cycle) has an undefined r: NULL, not NaN") {
    val r = one(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  test("two disjoint assortative cliques of different degree: r = +1 signature") {
    // K2 (degrees 1,1) + K3 (degrees 2,2): every edge joins equal
    // degrees -> perfectly assortative
    val r = one(Seq((1L, 2L), (3L, 4L), (4L, 5L), (3L, 5L)))
    assert(r.getAs[Double]("assortativity") == 1.0)
  }
}
