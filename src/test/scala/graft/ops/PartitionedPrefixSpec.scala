package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The round-10 plan proof for the shared auto-strategy prefix device
  * (EquiDepth.cumAutoMulti): Conformal, RocCurve, DecisionStump and
  * the lift table's global NTILE must all (a) produce bit-identical
  * results on the partitioned path, and (b) run NO unpartitioned
  * window over the value histogram when that path is active — the
  * only permitted unpartitioned window is the coarse-offset pass,
  * whose input is <= PrefixRanges+1 rows and which orders by the
  * coarse range key, never the value itself (the RankEvalSpec
  * contract, now holding for the whole family).
  */
class PartitionedPrefixSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** No unpartitioned window in `df`'s plan may order by a column in
    * `valueCols` (the per-value histogram); at least one partitioned
    * cumulative window must exist.
    */
  private def assertNoGlobalValueWindow(df: DataFrame, valueCols: Set[String]): Unit = {
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "expected a range-partitioned cumulative window")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val ordCols = w.orderSpec.flatMap(_.child.references.map(_.name)).toSet
      assert(ordCols.intersect(valueCols).isEmpty,
        s"global single-partition window over the value histogram: $w")
    }
  }

  test("cumPartitionedMulti == cumSingleMulti, both directions, two sum columns") {
    val counts = (1 to 500)
      .map(i => ((i * 7919L) % 1217 - 600, (i % 13).toLong + 1, (i % 5).toLong))
      .toDF("v", "p", "n")
      .groupBy("v").agg(sum("p").as("p"), sum("n").as("n"))
    for (asc <- Seq(true, false)) {
      val a = EquiDepth.cumSingleMulti(counts, Seq("p", "n"), asc)
        .orderBy("v").collect().map(_.toSeq)
      val b = EquiDepth.cumPartitionedMulti(counts, Seq("p", "n"), asc)
        .orderBy("v").collect().map(_.toSeq)
      assert(a.toSeq == b.toSeq, s"asc=$asc")
    }
  }

  test("Conformal: partitioned path identical, no global histogram window") {
    val cal = (1 to 400).map(i => ((i * 37L) % 311)).toDF("s")
    val ev = (1 to 150).map(i => ((i * 53L) % 290)).toDF("s")
    val single = Conformal.coverageAudit(cal, ev, alphaMilli = 200L)
    val part = Conformal.coverageAudit(cal, ev, alphaMilli = 200L,
      forcePartitioned = true)
    assert(single.collect().map(_.toSeq).toSeq == part.collect().map(_.toSeq).toSeq)
    assertNoGlobalValueWindow(part, Set("v", "s"))
    // the auto policy flips on the measured distinct count alone
    val auto = Conformal.coverageAudit(cal, ev, alphaMilli = 200L,
      distinctCutoff = 50L)
    assert(auto.collect().map(_.toSeq).toSeq == single.collect().map(_.toSeq).toSeq)
    assertNoGlobalValueWindow(auto, Set("v", "s"))
  }

  test("RocCurve: partitioned path identical (descending prefix), no global window") {
    val df = (1 to 400)
      .map(i => ((i * 41L) % 253, (i * 13) % 3 == 0))
      .toDF("score", "y")
    val single = RocCurve.points(df, col("score"), col("y"))
      .orderBy(col("threshold").desc)
    val part = RocCurve.points(df, col("score"), col("y"), forcePartitioned = true)
      .orderBy(col("threshold").desc)
    assert(single.collect().map(_.toSeq).toSeq == part.collect().map(_.toSeq).toSeq)
    assertNoGlobalValueWindow(part, Set("v", "threshold"))
  }

  test("DecisionStump: partitioned path identical incl. rk, no global window") {
    val df = (1 to 600)
      .map(i => ((i * 97L) % 389, (i * 7) % 5 < 2))
      .toDF("f", "y")
    val single = DecisionStump.splitScores(df, col("f"), col("y"))
      .orderBy("rk")
    val part = DecisionStump.splitScores(df, col("f"), col("y"),
      forcePartitioned = true).orderBy("rk")
    assert(single.collect().map(_.toSeq).toSeq == part.collect().map(_.toSeq).toSeq)
    // both the feature-value prefix AND the rank decomposition must
    // avoid ordering an unpartitioned window by the histogram value
    assertNoGlobalValueWindow(part, Set("v", "t", "f", "score_milli"))
  }

  test("ntileGlobal == ntileByGroup(constant group), no global window when partitioned") {
    val df = (1 to 500).map(i => ((i * 61L) % 457, i.toLong)).toDF("sc", "id0")
    val grouped = PerplexityBuckets
      .ntileByGroup(df, lit(1), col("sc"), col("id0"), k = 10)
      .select(col("id"), col("tile"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val global = PerplexityBuckets
      .ntileGlobal(df, col("sc"), col("id0"), k = 10, forcePartitioned = true)
    val got = global.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("tile")).toMap
    assert(got == grouped)
    assertNoGlobalValueWindow(global, Set("v", "__v", "sc"))
  }
}
