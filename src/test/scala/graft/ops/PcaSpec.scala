package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C138: power-iteration PCA — the dominant axis from one
  * distributed aggregation per round.
  */
class PcaSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val Dim = 8

  /** Corpus with variance concentrated on a planted axis: points
    * ±spread along `axis` plus small deterministic jitter elsewhere.
    */
  private def planted(axis: Int, n: Int = 200) =
    (0 until n).map { i =>
      val v = Array.fill(Dim)(0.0)
      v(axis) = if (i % 2 == 0) 1.0 else -1.0
      v((axis + 1) % Dim) = ((i % 7) - 3) * 0.02 // minor noise axis
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")

  private def pc1(df: org.apache.spark.sql.DataFrame): Array[Long] =
    Pca.topComponent(df, col("embedding"), dim = Dim, iters = 4)
      .orderBy(col("d")).collect().map(_.getLong(2))

  test("recovers a planted dominant axis") {
    val v = pc1(planted(axis = 3))
    // the component concentrates on dim 3: |v_3| near 1e4, others small
    assert(math.abs(v(3)) > 9900, v.mkString(","))
    (0 until Dim).filter(_ != 3).foreach(d =>
      assert(math.abs(v(d)) < 1500, s"dim $d: ${v(d)}"))
  }

  test("deterministic under repartitioning (exact integer rounds)") {
    val base = planted(axis = 5)
    val a = pc1(base.repartition(13))
    val b = pc1(base.repartition(2))
    assert(a.toSeq == b.toSeq)
  }

  test("degenerate corpus (all identical vectors) yields the zero guard") {
    val df = (0 until 50).map(i =>
      (i.toLong, Seq.fill(Dim)(0.5))).toDF("vec_id", "embedding")
    // centered data is exactly zero -> every iterate collapses to 0
    assert(pc1(df).forall(_ == 0L))
  }

  test("one aggregation per round: no vector shuffle in the round job") {
    val df = planted(axis = 1)
    val out = Pca.topComponent(df, col("embedding"), dim = Dim, iters = 2)
    assert(out.count() == Dim)
    // result frame is a local relation (driver-assembled O(dim) rows)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") || plan.contains("Scan ExistingRDD"), plan.take(300))
  }
}
