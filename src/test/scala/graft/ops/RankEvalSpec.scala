package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RankEvalSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("AUC matches the hand-computed Mann-Whitney with midrank ties") {
    // margins: pos {3, 1, 1}, neg {2, 1, 0}
    // sorted: 0(n) 1 1 1(2p,1n) 2(n) 3(p)
    // midrank of the 1-ties: ranks 2,3,4 -> 3; rank(0)=1 rank(2)=5 rank(3)=6
    // sum_pos ranks = 3 + 3 + 6 = 12; U = 12 - 3*4/2 = 6; AUC = 6/9 = 0.666...
    val scored = Seq((3L, 1), (1L, 1), (1L, 1), (2L, -1), (1L, -1), (0L, -1))
      .toDF("margin", "y")
    val r = RankEval.aucMilli(scored, col("margin"), col("y")).collect()(0)
    assert(r.getAs[Long]("p") == 3L && r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("u2") == 12L) // 2U
    assert(r.getAs[Long]("auc_milli") == 666L)
  }

  test("perfect, inverted, and degenerate rankings") {
    val perfect = Seq((10L, 1), (9L, 1), (2L, -1), (1L, -1)).toDF("margin", "y")
    assert(RankEval.aucMilli(perfect, col("margin"), col("y"))
      .collect()(0).getAs[Long]("auc_milli") == 1000L)
    val inverted = Seq((1L, 1), (2L, 1), (9L, -1), (10L, -1)).toDF("margin", "y")
    assert(RankEval.aucMilli(inverted, col("margin"), col("y"))
      .collect()(0).getAs[Long]("auc_milli") == 0L)
    val onlyPos = Seq((1L, 1), (2L, 1)).toDF("margin", "y")
    assert(RankEval.aucMilli(onlyPos, col("margin"), col("y"))
      .collect()(0).getAs[Long]("auc_milli") == -1L)
    // all-tied margins: AUC must be exactly 1/2
    val allTied = Seq((5L, 1), (5L, 1), (5L, -1), (5L, -1)).toDF("margin", "y")
    assert(RankEval.aucMilli(allTied, col("margin"), col("y"))
      .collect()(0).getAs[Long]("auc_milli") == 500L)
  }

  test("partitioned prefix sum gives identical results to the single window") {
    val scored = (1 to 400).map { i =>
      (((i * 37) % 97).toLong, if ((i * 13) % 3 == 0) 1 else -1)
    }.toDF("margin", "y")
    val a = RankEval.aucMilli(scored, col("margin"), col("y")).collect()(0)
    val b = RankEval.aucMilli(scored, col("margin"), col("y"), partitionedPrefix = true)
      .collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("wide-domain margins auto-select the partitioned prefix path (plan proof)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // 400 distinct margins against a cutoff of 100: the auto policy
    // must pick the partitioned path WITHOUT the caller opting in.
    val scored = (1 to 400).map(i => (i.toLong * 7, if (i % 3 == 0) 1 else -1))
      .toDF("margin", "y")
    val wide = RankEval.aucMilli(scored, col("margin"), col("y"),
      distinctCutoff = 100L)
    val windows = wide.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    // the per-value prefix sum must be partitioned (by the coarse
    // range key); any unpartitioned window in the plan may only be
    // the coarse-offset pass, whose input is <= PrefixRanges+1 rows —
    // it must order by the coarse key, never by the value itself
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "expected a range-partitioned cumulative window")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val ordCols = w.orderSpec.flatMap(_.child.references.map(_.name))
      assert(!ordCols.contains("v"),
        s"global single-partition window over the full value histogram: $w")
    }
    // and the narrow-domain default stays on the single small window
    val narrow = RankEval.aucMilli(scored, col("margin"), col("y"))
    val nw = narrow.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(nw.forall(_.partitionSpec.isEmpty) && nw.size == 1)
    // identical results either way
    assert(wide.collect()(0).toSeq == narrow.collect()(0).toSeq)
  }

  test("per-group AUC equals the global computation run group-by-group") {
    val scored = (1 to 300).map { i =>
      (s"g${i % 3}", ((i * 41) % 53).toLong, if ((i * 7) % 4 == 0) 1 else -1)
    }.toDF("grp0", "margin", "y")
    val grouped = RankEval.aucMilliByGroup(scored, col("grp0"), col("margin"), col("y"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("auc_milli")).toMap
    Seq("g0", "g1", "g2").foreach { g =>
      val solo = RankEval.aucMilli(scored.filter(col("grp0") === g), col("margin"), col("y"))
        .collect()(0).getAs[Long]("auc_milli")
      assert(grouped(g) == solo, s"group $g")
    }
  }
}
