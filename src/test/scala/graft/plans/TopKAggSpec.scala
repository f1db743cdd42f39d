package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TopKAggSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("top-k keeps the k best with ascending-id tie-break, best-first order") {
    val df = Seq(
      ("a", 10L, 1L), ("a", 30L, 2L), ("a", 20L, 3L), ("a", 30L, 4L), ("a", 5L, 5L),
      ("b", 7L, 6L)).toDF("g", "score", "id")
    val r = df.groupBy($"g").agg(TopKAgg.topK($"score", $"id", 3).as("top"))
      .select($"g", $"top").collect()
      .map(row => row.getString(0) ->
        row.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getLong(0), s.getLong(1))))
      .toMap
    // group a: 30@2 beats 30@4 on id; then 30@4, then 20@3; 10 and 5 evicted
    assert(r("a") == Seq((2L, 30L), (4L, 30L), (3L, 20L)))
    assert(r("b") == Seq((6L, 7L)))
  }

  test("matches the row_number window twin on the real documents table") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val viaAgg = docs.groupBy($"lang")
      .agg(TopKAgg.topK($"n_chars", $"doc_id", 5).as("top"))
      .select($"lang", posexplode($"top"))
      .select($"lang", ($"pos" + 1).as("rank"), $"col.id".as("doc_id"), $"col.score".as("n_chars"))
    val w = Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id")
    val viaWindow = docs
      .select($"lang", $"doc_id", $"n_chars".cast("long").as("n_chars"),
        row_number().over(w).cast("long").as("rank"))
      .filter($"rank" <= 5)
      .select($"lang", $"rank", $"doc_id", $"n_chars")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("merge order cannot change the result: buffer roundtrip and shuffled merges") {
    val entries = (1L to 100L).map(i => ((i * 37) % 50, i)) // colliding scores force tie-breaks
    val expected = entries.sortBy { case (s, i) => (-s, i) }.take(8)
    Seq(entries, entries.reverse, scala.util.Random.shuffle(entries)).foreach { order =>
      val halves = order.grouped(order.size / 3 + 1).map { chunk =>
        val b = new TopKAgg.Buffer(8)
        chunk.foreach { case (s, i) => b.offer(s, i) }
        TopKAgg.deserialize(TopKAgg.serialize(b)) // exercise the wire format
      }
      val merged = halves.reduce { (x, y) =>
        y.result().foreach { case (s, i) => x.offer(s, i) }
        x
      }
      assert(merged.result() == expected)
    }
  }

  test("plan shows partial object aggregation (map-side heaps, not a window sort)") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val plan = docs.groupBy($"lang")
      .agg(TopKAgg.topK($"n_chars", $"doc_id", 5).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(plan.contains("partial_graft_top_k") || plan.contains("partial graft_top_k")
      || plan.toLowerCase.contains("partial"))
    assert(!plan.contains("WindowExec"))
  }

  test("SQL registration: graft_top_k usable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, 10L), (2L, 30L), (3L, 20L)).toDF("id", "score")
      .createOrReplaceTempView("topk_in")
    val r = spark.sql("SELECT graft_top_k(score, id, 2) AS top FROM topk_in")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(s => (s.getLong(0), s.getLong(1)))
    assert(r == Seq((2L, 30L), (3L, 20L)))
  }
}
