package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C129: synchronous LPA — hand-traced rounds on a bridged pair of
  * triangles (LPA keeps the dense sides apart where connected
  * components would merge them), and the window-free per-round plan.
  */
class LabelPropSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // triangles {1,2,3} and {4,5,6} joined by the bridge 3-4
  private def bridged = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L),
    (4L, 5L), (4L, 6L), (5L, 6L),
    (3L, 4L)
  ).toDF("src", "dst")

  test("bridged triangles split into two communities (hand-traced 3 rounds)") {
    val got = LabelProp.communities(bridged, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand trace: r1 = (1->2, 2->1, 3->1, 4->3, 5->4, 6->4);
    // r2 = (1->1, 2->1, 3->1, 4->4, 5->3, 6->3);
    // r3 = (1->1, 2->1, 3->1, 4->3, 5->3, 6->3)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
    // the dense sides stay apart — unlike the connected-components
    // closure, which would label all six nodes 1
  }

  test("a clique converges to its minimum id in one round") {
    val clique = Seq((10L, 11L), (10L, 12L), (11L, 12L)).toDF("src", "dst")
    // r1: each node sees two distinct neighbour labels -> tie -> min
    val got = LabelProp.communities(clique, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 11L, 11L -> 10L, 12L -> 10L))
    // r2 settles: everyone votes 10
    val got2 = LabelProp.communities(clique, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2.values.toSet === Set(10L, 11L) || got2.values.toSet === Set(10L))
  }

  test("per-round plan is aggregate-only: no windows, no cartesians") {
    val plan = LabelProp.communities(bridged, iters = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"))
    assert(!plan.contains("CartesianProduct"))
  }
}
