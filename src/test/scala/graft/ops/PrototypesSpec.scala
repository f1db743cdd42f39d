package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C125: per-cluster prototype selection — picks must be exactly the
  * m centroid-nearest rows of every cell under the (dist, id) total
  * order, and on well-separated clusters each cell's prototypes stay
  * inside their own planted cluster.
  */
class PrototypesSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val Dim = 4

  // three planted clusters at offsets 0 / 10 / 20, ids interleaved so
  // seed picking (smallest ids) spans all clusters
  private def fixture = (0 until 30).map { i =>
    val cluster = i % 3
    val base = cluster * 10.0
    val v = Array.tabulate(Dim)(d => base + 0.01 * ((i * 7 + d) % 5))
    (i.toLong + 1L, v.toSeq)
  }

  test("prototypes are the m nearest-to-centroid rows per cell, ranks contiguous") {
    val df = fixture.toDF("vec_id", "embedding")
    val m = 3
    val got = Prototypes.select(df, col("vec_id"), col("embedding"),
      k = 3, iters = 2, m = m)

    // reference: same integer assignment, per-cell full sort
    val cents = IvfIndex.fitIntegerPortable(df, col("vec_id"), col("embedding"),
      k = 3, iters = 2, scale = 1000L)
    val qv = IvfIndex.quantized(col("embedding"), 1000L)
    val dists = array(cents.map(c =>
      graft.plans.SqDistLongExpr.sqDist(qv, typedLit(c.toSeq))): _*)
    val assigned = df
      .select(col("vec_id"), dists.as("ds"))
      .select(col("vec_id"),
        (array_position(col("ds"), array_min(col("ds"))) - 1).cast("int").as("cell"),
        array_min(col("ds")).as("sq_dist"))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(0)))
    val expected = assigned.groupBy(_._1).toSeq.flatMap { case (cell, rows) =>
      rows.sortBy(t => (t._2, t._3)).take(m).zipWithIndex.map {
        case ((_, d, id), i) => (cell, i + 1L, id, d)
      }.toSeq
    }.toSet

    val gotSet = got.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotSet === expected)

    // ranks contiguous from 1 per cell
    val byCell = gotSet.groupBy(_._1)
    byCell.foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq.sorted === (1L to rows.size.toLong))
    }
  }

  test("well-separated clusters yield within-cluster prototypes") {
    val df = fixture.toDF("vec_id", "embedding")
    val got = Prototypes.select(df, col("vec_id"), col("embedding"),
      k = 3, iters = 3, m = 5).collect()
    // every selected row's planted cluster (id-1) % 3 must be constant
    // within its assigned cell
    val plantedByCell = got.groupBy(_.getInt(0))
      .map { case (cell, rows) => cell -> rows.map(r => (r.getLong(2) - 1) % 3).distinct }
    plantedByCell.foreach { case (_, planted) => assert(planted.length === 1) }
    // prototypes are central: sq_dist small relative to cluster spacing
    got.foreach(r => assert(r.getLong(3) < 1000L * 1000L))
  }

  test("plan is window-free: bounded TopKAgg aggregation, narrow assignment") {
    val df = fixture.toDF("vec_id", "embedding")
    val plan = Prototypes.select(df, col("vec_id"), col("embedding"),
      k = 3, iters = 2, m = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"))
    assert(!plan.contains("CartesianProduct"))
  }
}
