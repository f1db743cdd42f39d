package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.GtfsRtPipeline.ParquetStateStore

class DriftMonitorSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("reference-like source scores near zero, skewed source diverges") {
    val reference = DriftMonitor.fitReference(
      Seq.fill(50)("alpha beta gamma delta").toDF("text"), col("text"))
    val store = new ParquetStateStore(tmp("drift_store"))
    val batch = Seq(
      ("clean", "alpha beta gamma delta"),
      ("clean", "beta alpha delta gamma"),
      ("skewed", "zzz zzz zzz zzz"),
      ("skewed", "qqq qqq zzz zzz")
    ).toDF("source", "text")
    val got = DriftMonitor.updateBatch(batch, "source", "text", store, reference)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("clean")._1 == 8L && got("skewed")._1 == 8L, "token counts")
    assert(got("clean")._2 < 0.1, s"uniform-over-reference source ~0: ${got("clean")._2}")
    assert(got("skewed")._2 > 1.0, s"out-of-vocab source diverges: ${got("skewed")._2}")
    assert(got("skewed")._2 > got("clean")._2)
  }

  test("counts accumulate across batches: drift reflects ALL history, not the last batch") {
    val reference = DriftMonitor.fitReference(
      Seq.fill(50)("alpha beta").toDF("text"), col("text"))
    val store = new ParquetStateStore(tmp("drift_store2"))
    // batch 1: source drifts hard
    DriftMonitor.updateBatch(Seq(("s1", "zzz zzz zzz zzz zzz zzz")).toDF("source", "text"),
      "source", "text", store, reference)
    // batch 2: same source sends reference-like text; accumulated KL
    // must sit BETWEEN pure-drift and pure-clean
    val after2 = DriftMonitor.updateBatch(
        Seq(("s1", "alpha beta alpha beta alpha beta")).toDF("source", "text"),
        "source", "text", store, reference)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(after2("s1")._1 == 12L, "12 tokens accumulated over two batches")
    val freshClean = DriftMonitor.updateBatch(
        Seq(("s2", "alpha beta alpha beta alpha beta")).toDF("source", "text"),
        "source", "text", store, reference)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(after2("s1")._2 > freshClean("s2"),
      s"history keeps s1 above a clean source: ${after2("s1")._2} vs ${freshClean("s2")}")
    // batch-order insensitivity: one-shot over the union matches
    val store2 = new ParquetStateStore(tmp("drift_store3"))
    val oneShot = DriftMonitor.updateBatch(
        Seq(("s1", "zzz zzz zzz zzz zzz zzz"),
          ("s1", "alpha beta alpha beta alpha beta")).toDF("source", "text"),
        "source", "text", store2, reference)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(oneShot("s1") == after2("s1")._2, "accumulated == one-shot")
  }

  test("replayed batch id is not merged twice (foreachBatch at-least-once)") {
    val reference = DriftMonitor.fitReference(
      Seq.fill(20)("alpha beta").toDF("text"), col("text"))
    val store = new ParquetStateStore(tmp("drift_store_replay"))
    val batch = Seq(("s1", "alpha beta alpha beta")).toDF("source", "text")
    val first = DriftMonitor.updateBatch(batch, "source", "text", store, reference,
        batchId = Some(7L))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // same batchId replayed: counts and KL must be unchanged
    val replay = DriftMonitor.updateBatch(batch, "source", "text", store, reference,
        batchId = Some(7L))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(first("s1")._1 == 4L && replay == first)
    // a NEW batch id does merge
    val next = DriftMonitor.updateBatch(batch, "source", "text", store, reference,
        batchId = Some(8L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(next("s1") == 8L)
  }

  test("end-to-end: file-source stream emits per-batch drift snapshots") {
    val reference = DriftMonitor.fitReference(
      Seq.fill(20)("alpha beta gamma").toDF("text"), col("text"))
    val inDir = tmp("drift_in")
    val outDir = tmp("drift_out")
    val store = new ParquetStateStore(tmp("drift_store4"))
    Seq(("a", "alpha beta gamma"), ("b", "zzz zzz zzz"))
      .toDF("source", "text").write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream
      .schema("source string, text string").parquet(inDir)
    val q = DriftMonitor.writer(stream, "source", "text", store, reference, outDir)
      .option("checkpointLocation", tmp("drift_ckpt"))
      .start()
    q.awaitTermination(60000)
    val out = spark.read.parquet(outDir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set("a", "b"))
    assert(out("b") > out("a"))
  }
}
