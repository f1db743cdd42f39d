package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("backward as-of picks latest right row at or before left time") {
    val left = Seq(
      (1L, "u1", 100L),
      (2L, "u1", 250L),
      (3L, "u2", 50L)).toDF("event_id", "user_id", "t")
    val right = Seq(
      ("u1", 90L, 901L),
      ("u1", 100L, 902L), // equal time: inclusive match
      ("u1", 240L, 903L),
      ("u2", 60L, 904L) // after left -> no match
    ).toDF("user_id", "t", "rid")

    val out = AsOfJoin.asofBackward(left, right,
        on = Seq("user_id"), leftTime = "t", rightTime = "t",
        rightPayload = Seq("t"), tieBreak = "rid")
      .select(col("event_id"), col("asof_match.rid").as("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out == Map(1L -> 902L, 2L -> 903L, 3L -> -1L))
  }

  test("ties on right time resolved by greatest tieBreak") {
    val left = Seq((1L, "u1", 100L)).toDF("event_id", "user_id", "t")
    val right = Seq(("u1", 90L, 1L), ("u1", 90L, 7L), ("u1", 90L, 3L))
      .toDF("user_id", "t", "rid")
    val rid = AsOfJoin.asofBackward(left, right, Seq("user_id"), "t", "t", Seq("t"), "rid")
      .select(col("asof_match.rid")).first().getLong(0)
    assert(rid == 7L)
  }

  test("plan shuffles once on the key (no range join / cartesian)") {
    val left = Seq((1L, "u1", 100L)).toDF("event_id", "user_id", "t")
    val right = Seq(("u1", 90L, 1L)).toDF("user_id", "t", "rid")
    val plan = AsOfJoin.asofBackward(left, right, Seq("user_id"), "t", "t", Seq("t"), "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
