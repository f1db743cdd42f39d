package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.{Features, LinearClassifier}
import graft.ops.LinearClassifier.PerceptronModel
import graft.streaming.GtfsRtPipeline.ParquetStateStore

/** B17+B18+C99 full loop, end to end: the streaming gate serves a
  * STATIC model while the drift monitor watches the accumulated
  * margin distribution; when PSI crosses, the ONE latched signal row
  * is consumed by a scheduler stub that re-fits the C99 perceptron on
  * the labeled drift window, publishes the new model version, resets
  * the monitor's stores against a fresh reference, and the gate swaps
  * — serving and monitoring stay decoupled throughout (the batch that
  * FIRES the signal is still served by the OLD model; only the next
  * batch sees the new one). Replay of the crossing batch is injected
  * mid-loop: counts don't re-merge, the signal doesn't double-fire,
  * the scheduler doesn't re-fit, and the gate's duplicate appends
  * collapse under exact dedup (the B9 contract).
  *
  * The stream is a real file-source readStream driven one
  * AvailableNow run per arriving batch over a shared checkpoint (the
  * StreamingScorerSpec device), so batch ids are the engine's own;
  * the replay re-invokes the SAME foreachBatch body with the same
  * batch id — exactly the at-least-once contract foreachBatch
  * documents.
  */
class DriftRefitE2eSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val Dim = 32

  // vocabulary A (fit-time population): aye=accept, nay=reject
  private def vocabA(ids: Range): Seq[(Long, String, Int)] = ids.map { i =>
    if (i % 2 == 0) (i.toLong, "aye aye captain " + ("aye " * (i % 3)).trim, 1)
    else (i.toLong, "nay nay motion " + ("nay " * (i % 3)).trim, -1)
  }
  // the drift: SAME vocabulary, docs 6× longer — margins under model
  // A scale 6× (so the positive class is still accepted: the replay
  // really appends rows), while the margin DISTRIBUTION shifts
  // entirely into new bins and PSI crosses in one batch (the
  // DriftRefitTriggerSpec device)
  private def vocabB(ids: Range): Seq[(Long, String, Int)] = ids.map { i =>
    if (i % 2 == 0) (i.toLong, ("aye aye captain " * 6).trim, 1)
    else (i.toLong, ("nay nay motion " * 6).trim, -1)
  }

  private def fit(rows: Seq[(Long, String, Int)]): PerceptronModel = {
    val df = rows.toDF("doc_id", "text", "y")
    LinearClassifier.fitPerceptron(
      Features.hashedBow(df, col("doc_id"), col("text"), Dim),
      df.select(col("doc_id"), col("y")), Dim, epochs = 8)
  }

  test("gate -> drift -> signal -> refit -> swap across 4 micro-batches with replay") {
    val tmp = java.nio.file.Files.createTempDirectory("driftloop").toString
    val dropDir = s"$tmp/drop"
    val acceptedPath = s"$tmp/accepted"

    // epoch-scoped monitor state: the scheduler swaps these on re-fit
    var epoch = 0
    def counts = new ParquetStateStore(s"$tmp/counts/epoch$epoch")
    def signals = new ParquetStateStore(s"$tmp/signals/epoch$epoch")

    // model A + its fit-time reference histogram. Ranges are full
    // period-6 cycles of the vocabA pattern (i%2 × i%3), so any two
    // full-cycle ranges have IDENTICAL margin proportions — the
    // stationary batch's PSI is exactly 0 by construction.
    val seed = vocabA(1 to 36)
    var servedModel = fit(seed)
    val modelA = servedModel
    var reference = DriftRefitTrigger.referenceBins(
      seed.toDF("doc_id", "text", "y"), "text", servedModel, Dim, binWidth = 1L)

    var refits = 0
    var pendingSignal = false
    var modelServedPerBatch = Map.empty[Long, PerceptronModel]

    // the foreachBatch body: gate with the CURRENTLY SERVED model,
    // then monitor. The signal is only RECORDED here — the scheduler
    // consumes it OUT OF BAND (the B18 decoupled-serving contract:
    // the gate keeps the old model until the re-fit lands), which is
    // also what makes a replay of the crossing batch byte-identical.
    def body(batch: DataFrame, id: Long): Unit = {
      val m = servedModel
      modelServedPerBatch += id -> m
      StreamingScorer.gate(m, Dim).accept(batch.drop("y"), col("text"))
        .write.mode("append").parquet(acceptedPath)
      val sig = DriftRefitTrigger.updateBatch(batch.drop("y"), "text", m, Dim, 1L,
        reference, counts, signals, batchId = Some(id)).collect()
      if (sig.nonEmpty) pendingSignal = true
    }

    // the scheduler stub: consume the pending signal, re-fit C99 on
    // the labeled drift window, publish + swap, reset the monitor
    def schedulerStep(window: Seq[(Long, String, Int)]): Unit = {
      assert(pendingSignal, "scheduler runs only on a signal")
      refits += 1
      val refit = fit(window)
      LinearClassifier.saveModel(spark, refit, s"$tmp/models/v$refits")
      servedModel = LinearClassifier.loadModel(spark, s"$tmp/models/v$refits", Dim)
      reference = DriftRefitTrigger.referenceBins(
        window.toDF("doc_id", "text", "y"), "text", servedModel, Dim, 1L)
      epoch += 1
      pendingSignal = false
    }

    def runStream(): Unit = {
      val q = spark.readStream.schema("doc_id LONG, text STRING, y INT")
        .parquet(dropDir)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch((b: DataFrame, id: Long) => body(b, id))
        .start()
      q.awaitTermination()
    }

    // ---- batch 0: stationary vocab-A inflow -> no signal, gate serves A
    val b0 = vocabA(101 to 136)
    b0.toDF("doc_id", "text", "y").write.mode("append").parquet(dropDir)
    runStream()
    assert(refits == 0 && epoch == 0, "stationary batch must not trigger a re-fit")
    val acceptedAfterB0 = spark.read.parquet(acceptedPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wantB0 = LinearClassifier.scoreText(b0.toDF("doc_id", "text", "y"),
        col("doc_id"), col("text"), Dim, modelA)
      .filter(col("margin") > 0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(acceptedAfterB0 == wantB0 && acceptedAfterB0.nonEmpty)

    // ---- batch 1: the drift window -> the signal fires, but the
    // scheduler has not consumed it yet: the gate KEEPS model A
    val b1 = vocabB(201 to 320)
    b1.toDF("doc_id", "text", "y").write.mode("append").parquet(dropDir)
    runStream()
    assert(pendingSignal, "drift window must raise the re-fit signal")
    assert(refits == 0 && epoch == 0,
      "signal raised but not yet consumed: no re-fit, no store reset")
    val b1Id = modelServedPerBatch.keys.max
    assert(modelServedPerBatch(b1Id).weights.toSeq == modelA.weights.toSeq,
      "the batch that FIRES the signal is still served by the old model")
    assert(servedModel.weights.toSeq == modelA.weights.toSeq,
      "serving stays decoupled until the scheduler lands the re-fit")

    // ---- replay of the crossing batch BEFORE the re-fit lands (the
    // at-least-once window a real restart hits): same body, same
    // batch id, same serving model -> byte-identical appends that
    // exact dedup (B9) collapses; the monitor neither re-merges the
    // batch (applied-tag skip) nor double-fires (latched signal)
    val acceptedBeforeReplay = spark.read.parquet(acceptedPath).count()
    body(b1.toDF("doc_id", "text", "y"), b1Id)
    assert(refits == 0 && epoch == 0, "replay must not re-fit or reset")
    val accepted = spark.read.parquet(acceptedPath)
    assert(accepted.count() > acceptedBeforeReplay,
      "replay appends duplicates (at-least-once)")
    assert(accepted.count() > accepted.dropDuplicates("doc_id").count(),
      "the appended rows really are duplicates")
    assert(accepted.dropDuplicates("doc_id").count() == acceptedBeforeReplay,
      "exact dedup restores exactly the pre-replay accepted set")

    // ---- the scheduler consumes the signal: re-fit on the labeled
    // drift window, swap, reset the monitor against a new reference
    schedulerStep(b1)
    assert(refits == 1 && epoch == 1)
    assert(servedModel.weights.toSeq != modelA.weights.toSeq,
      "the swapped-in model must differ from model A")

    // ---- a SECOND replay of the crossing batch arriving AFTER the
    // swap (the other at-least-once window): the NEW model gates it
    // and the epoch-fresh monitor counts it against the new
    // reference — but b1 IS that reference's fit window, so PSI ~ 0
    // and the handshake must not re-fire; no re-fit, no epoch churn
    body(b1.toDF("doc_id", "text", "y"), b1Id)
    assert(!pendingSignal, "post-swap replay must not re-raise the signal")
    assert(refits == 1 && epoch == 1, "post-swap replay must not re-fit")

    // ---- batch 2: vocab-B inflow under the NEW model: gate accepts
    // the positive-class docs model B was fit on; the monitor, reset
    // against the vocab-B reference, stays quiet
    val b2 = vocabB(401 to 430)
    b2.toDF("doc_id", "text", "y").write.mode("append").parquet(dropDir)
    runStream()
    assert(refits == 1, "stationary-under-new-reference batch must stay quiet")
    val modelB = servedModel
    val gotB2 = spark.read.parquet(acceptedPath)
      .filter(col("doc_id") >= 401L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val wantB2 = LinearClassifier.scoreText(b2.toDF("doc_id", "text", "y"),
        col("doc_id"), col("text"), Dim, modelB)
      .filter(col("margin") > 0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotB2 == wantB2 && gotB2.nonEmpty,
      "post-swap batch must be gated by the re-fit model")
    // the perceptron separates the (separable) vocab-B classes: every
    // accepted doc is a positive-class one
    assert(gotB2.forall(_ % 2 == 0),
      "model B accepts exactly the positive-class docs")
  }
}
