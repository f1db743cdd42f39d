package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.LinearClassifier.PerceptronModel
import graft.streaming.GtfsRtPipeline.ParquetStateStore

/** B17 drift-refit handshake: PSI of accumulated margins vs the
  * fit-time reference, one latched signal on first crossing.
  */
class DriftRefitTriggerSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // all-ones weights, zero bias: margin == token count, so binWidth=1
  // makes the margin histogram the token-count histogram — drift is
  // then just "documents got much longer"
  private val Dim = 8
  private val model = PerceptronModel(Array.fill(Dim)(1L), 0L, Seq.empty)

  private def docs(ids: Range, tokens: Int) =
    ids.map(i => (i.toLong, Seq.fill(tokens)("tok").mkString(" ")))
      .toDF("doc_id", "text")

  test("stationary inflow stays quiet; drift fires within ONE batch; replay and latch") {
    val counts = new ParquetStateStore(tmp("drift_counts"))
    val signals = new ParquetStateStore(tmp("drift_signals"))
    val ref = DriftRefitTrigger.referenceBins(docs(1 to 50, 5), "text", model, Dim, 1L)
    assert(ref.toMap == Map(5L -> 50L))

    // batch 1: same distribution -> no signal
    val s1 = DriftRefitTrigger.updateBatch(docs(51 to 80, 5), "text", model, Dim, 1L,
      ref, counts, signals, batchId = Some(1L))
    assert(s1.isEmpty, "stationary batch must not fire")
    assert(signals.latestVersion.isEmpty)

    // batch 2: drifted (all docs 3x longer) -> PSI crosses within
    // this one micro-batch and the signal row fires
    val s2 = DriftRefitTrigger.updateBatch(docs(81 to 200, 15), "text", model, Dim, 1L,
      ref, counts, signals, batchId = Some(2L)).collect()
    assert(s2.length == 1, "drifted batch must fire exactly one signal row")
    assert(s2(0).getLong(0) == 2L)
    assert(s2(0).getLong(1) > 250L, s"psi_milli ${s2(0).getLong(1)} must exceed the threshold")
    val countsVersionAfterFire = counts.latestVersion

    // replay of batch 2 (at-least-once foreachBatch): counts are NOT
    // re-merged and the signal does NOT double-fire
    val s2replay = DriftRefitTrigger.updateBatch(docs(81 to 200, 15), "text", model, Dim, 1L,
      ref, counts, signals, batchId = Some(2L))
    assert(s2replay.isEmpty, "replayed crossing batch must not double-fire")
    assert(counts.latestVersion == countsVersionAfterFire, "replay must not re-merge")
    assert(signals.latestVersion.contains(0L))

    // batch 3: still drifted, but the signal is latched -> quiet
    val s3 = DriftRefitTrigger.updateBatch(docs(201 to 260, 15), "text", model, Dim, 1L,
      ref, counts, signals, batchId = Some(3L))
    assert(s3.isEmpty, "latched signal must not re-fire")
    assert(counts.latestVersion.exists(v => countsVersionAfterFire.exists(_ < v)),
      "non-replay batches keep merging counts while latched")
  }
}
