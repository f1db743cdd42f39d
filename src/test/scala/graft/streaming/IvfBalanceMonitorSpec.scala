package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.IvfIndex
import graft.streaming.GtfsRtPipeline.ParquetStateStore

class IvfBalanceMonitorSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def vecs(ids: Range, shift: Int = 0) =
    ids.map { i =>
      (i.toLong, (1 to 8).map(j => (((i * j + shift) % 7) - 3).toDouble).toArray)
    }.toDF("vec_id", "embedding")

  private def fitCents(n: Int, k: Int) =
    IvfIndex.fitIntegerPortable(vecs(1 to n), col("vec_id"), col("embedding"),
      k, iters = 2, scale = 1000L)

  test("accumulated snapshot equals the batch cellStats over the union") {
    val cents = fitCents(60, 4)
    val store = new ParquetStateStore(tmp("ivfbal_store"))
    IvfBalanceMonitor.updateBatch(vecs(1 to 30), "embedding", store, cents)
    val snap = IvfBalanceMonitor.updateBatch(vecs(31 to 60), "embedding", store, cents)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // same arithmetic as C95 over the full corpus, assigned to the
    // SAME fixed centroids
    val counts = vecs(1 to 60)
      .select(IvfIndex.cellOfInt(
        IvfIndex.quantized(col("embedding"), 1000L), cents).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxN = counts.values.max
    (0 until 4).foreach { c =>
      val n = counts.getOrElse(c, 0L)
      assert(snap(c)._1 == n)
      assert(snap(c)._2 == math.floor(1000.0 * n / 60).toLong)
      assert(snap(c)._3 == math.floor(1000.0 * maxN * 4 / 60).toLong)
    }
  }

  test("drifted inflow raises the imbalance factor") {
    val cents = fitCents(60, 4)
    val store = new ParquetStateStore(tmp("ivfbal_store2"))
    val balanced = IvfBalanceMonitor.updateBatch(vecs(1 to 60), "embedding", store, cents)
      .collect().map(_.getLong(3)).head
    // a degenerate inflow (identical vectors) piles into one cell
    val drifted = (1L to 120L).map(i => (i, Array.fill(8)(2.5)))
      .toDF("vec_id", "embedding")
    val after = IvfBalanceMonitor.updateBatch(drifted, "embedding", store, cents)
      .collect().map(_.getLong(3)).head
    assert(after > balanced, s"imbalance must climb: $balanced -> $after")
  }

  test("replayed batch id is not merged twice") {
    val cents = fitCents(40, 4)
    val store = new ParquetStateStore(tmp("ivfbal_store3"))
    val b = vecs(1 to 40)
    val first = IvfBalanceMonitor.updateBatch(b, "embedding", store, cents,
        batchId = Some(3L))
      .agg(sum(col("n_vectors"))).collect()(0).getLong(0)
    val replay = IvfBalanceMonitor.updateBatch(b, "embedding", store, cents,
        batchId = Some(3L))
      .agg(sum(col("n_vectors"))).collect()(0).getLong(0)
    assert(first == 40L && replay == 40L)
    val next = IvfBalanceMonitor.updateBatch(b, "embedding", store, cents,
        batchId = Some(4L))
      .agg(sum(col("n_vectors"))).collect()(0).getLong(0)
    assert(next == 80L)
  }

  test("end-to-end: file-source stream emits per-batch balance snapshots") {
    val cents = fitCents(60, 4)
    val inDir = tmp("ivfbal_in")
    val outDir = tmp("ivfbal_out")
    val store = new ParquetStateStore(tmp("ivfbal_store4"))
    vecs(1 to 60).write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream
      .schema("vec_id bigint, embedding array<double>").parquet(inDir)
    val q = IvfBalanceMonitor.writer(stream, "embedding", store, cents, outDir)
      .option("checkpointLocation", tmp("ivfbal_ckpt"))
      .start()
    q.awaitTermination(60000)
    val out = spark.read.parquet(outDir)
    assert(out.agg(sum(col("n_vectors"))).collect()(0).getLong(0) == 60L)
    assert(out.select(col("cell")).distinct().count() == 4L)
  }
}
