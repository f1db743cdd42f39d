package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Decontaminate

/** B15: streaming decontamination — the continuous twin of C61's
  * hard decontamination gate.
  */
class StreamingDeconSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val evalDocs = Seq(
    (900L, "benchmark question about spark join ordering"),
    (901L, "held out evaluation prompt with rare tokens"))

  // docs 2 and 12 embed an eval shingle; the rest are clean
  private val batch1 = Seq(
    (1L, "completely unrelated text about databases"),
    (2L, "contains the benchmark question about spark internals"),
    (3L, "another clean document with plain words"))
  private val batch2 = Seq(
    (11L, "more clean corpus content arriving later"),
    (12L, "slipped in held out evaluation prompt again"),
    (13L, "final clean row of the second drop"))

  test("gate.clean equals batch cleanDocs on the same documents") {
    val eval = evalDocs.toDF("doc_id", "text")
    val g = StreamingDecon.gate(eval, col("text"), shingleK = 3)
    try {
      val docs = (batch1 ++ batch2).toDF("doc_id", "text")
      val got = g.clean(docs, col("doc_id"), col("text"))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val want = Decontaminate.cleanDocs(docs, col("doc_id"), col("text"),
          eval, col("text"), shingleK = 3)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want)
      assert(got == Seq(1L, 3L, 11L, 13L))
    } finally g.release()
  }

  test("streaming gate drops contaminated docs across micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("sdecon").toString
    val dropDir = s"$tmp/drop"
    val accepted = s"$tmp/accepted"
    val eval = evalDocs.toDF("doc_id", "text")
    val g = StreamingDecon.gate(eval, col("text"), shingleK = 3)
    try {
      batch1.toDF("doc_id", "text").write.mode("append").parquet(dropDir)
      val q1 = StreamingDecon.writer(
          spark.readStream.schema("doc_id LONG, text STRING").parquet(dropDir),
          "doc_id", "text", g, accepted)
        .option("checkpointLocation", s"$tmp/ckpt")
        .start()
      q1.awaitTermination()

      batch2.toDF("doc_id", "text").write.mode("append").parquet(dropDir)
      val q2 = StreamingDecon.writer(
          spark.readStream.schema("doc_id LONG, text STRING").parquet(dropDir),
          "doc_id", "text", g, accepted)
        .option("checkpointLocation", s"$tmp/ckpt")
        .start()
      q2.awaitTermination()

      val got = spark.read.parquet(accepted)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 3L, 11L, 13L))
    } finally g.release()
  }
}
