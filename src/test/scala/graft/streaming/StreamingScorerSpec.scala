package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.{Features, LinearClassifier}

/** B17: streaming classifier gate — the continuous twin of C99's
  * serving path, plus scoreText/persistence parity.
  */
class StreamingScorerSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val Dim = 16

  private def trainDocs = Seq(
    (1L, "aye aye the captain", 1),
    (2L, "the aye votes aye aye", 1),
    (3L, "aye the", 1),
    (4L, "nay nay the motion", -1),
    (5L, "the nay nay nay", -1),
    (6L, "nay the nay", -1))
    .toDF("doc_id", "text", "y")

  private lazy val model = LinearClassifier.fitPerceptron(
    Features.hashedBow(trainDocs, col("doc_id"), col("text"), Dim),
    trainDocs.select(col("doc_id"), col("y")), Dim, epochs = 6)

  private val batch1 = Seq((11L, "aye aye good crew"), (12L, "nay bad nay"))
  private val batch2 = Seq((21L, "the aye holds"), (22L, "nay again nay"), (23L, "   "))

  test("scoreText margins equal score-over-hashedBow exactly; token-less docs flagged") {
    val docs = (batch1 ++ batch2).toDF("doc_id", "text")
    val viaText = LinearClassifier.scoreText(docs, col("doc_id"), col("text"), Dim, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val viaBow = LinearClassifier.score(
      Features.hashedBow(docs, col("doc_id"), col("text"), Dim), model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaBow.foreach { case (d, m) =>
      assert(viaText(d)._1 == m && viaText(d)._2, s"doc $d")
    }
    // doc 23 has no tokens: absent from the bow path, bias-only here
    assert(!viaBow.contains(23L))
    assert(viaText(23L) == ((model.bias, false)))
  }

  test("null text scores exactly like empty text (bias-only, never NULL margin)") {
    val docs = Seq((31L, null.asInstanceOf[String]), (32L, ""), (33L, "aye"))
      .toDF("doc_id", "text")
    val scored = LinearClassifier.scoreText(docs, col("doc_id"), col("text"), Dim, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(scored(31L) == ((model.bias, false)))
    assert(scored(31L) == scored(32L))
    // and the gate treats both representations identically
    val g = StreamingScorer.gate(model, Dim)
    val kept = g.accept(docs, col("text")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(31L) == kept.contains(32L))
  }

  test("model save/load round-trips and scores identically") {
    val path = java.nio.file.Files.createTempDirectory("pmodel").toString + "/m"
    LinearClassifier.saveModel(spark, model, path)
    val loaded = LinearClassifier.loadModel(spark, path, Dim)
    assert(loaded.weights.toSeq == model.weights.toSeq && loaded.bias == model.bias)
    val docs = batch1.toDF("doc_id", "text")
    val a = LinearClassifier.scoreText(docs, col("doc_id"), col("text"), Dim, model).collect()
    val b = LinearClassifier.scoreText(docs, col("doc_id"), col("text"), Dim, loaded).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("gate.accept is filter-only (no exchange) and equals batch scoring") {
    val g = StreamingScorer.gate(model, Dim)
    val docs = (batch1 ++ batch2).toDF("doc_id", "text")
    val accepted = g.accept(docs, col("text"))
    val plan = accepted.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate plan shuffles:\n$plan")
    val got = accepted.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = LinearClassifier.scoreText(docs, col("doc_id"), col("text"), Dim, model)
      .filter(col("margin") > 0).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("streaming gate accepts positives across micro-batches, equals batch scoring") {
    val tmp = java.nio.file.Files.createTempDirectory("sscore").toString
    val dropDir = s"$tmp/drop"
    val accepted = s"$tmp/accepted"
    val g = StreamingScorer.gate(model, Dim)

    batch1.toDF("doc_id", "text").write.mode("append").parquet(dropDir)
    val q1 = StreamingScorer.writer(
        spark.readStream.schema("doc_id LONG, text STRING").parquet(dropDir),
        "text", g, accepted)
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q1.awaitTermination()

    batch2.toDF("doc_id", "text").write.mode("append").parquet(dropDir)
    val q2 = StreamingScorer.writer(
        spark.readStream.schema("doc_id LONG, text STRING").parquet(dropDir),
        "text", g, accepted)
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q2.awaitTermination()

    val got = spark.read.parquet(accepted)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val all = (batch1 ++ batch2).toDF("doc_id", "text")
    val want = LinearClassifier.scoreText(all, col("doc_id"), col("text"), Dim, model)
      .filter(col("margin") > 0).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    // margins ride along for later calibration
    assert(spark.read.parquet(accepted).columns.contains("margin"))
  }
}
