package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.GtfsRtPipeline.ParquetStateStore

/** B9: incremental corpus ingest — exact dedup of a document stream
  * against the durable fingerprint store.
  */
class IncrementalIngestSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("batches dedupe within themselves and against all prior history") {
    val tmp = java.nio.file.Files.createTempDirectory("ingest").toString
    val store = new ParquetStateStore(s"$tmp/fp")
    val accepted = s"$tmp/accepted"

    // batch 1: doc 2 and 3 share content → min id survives
    IncrementalIngest.ingestBatch(
      Seq((1L, "alpha"), (2L, "beta"), (3L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text", store, accepted)
    // batch 2: "alpha" is a month-old duplicate; "gamma" is new
    IncrementalIngest.ingestBatch(
      Seq((10L, "alpha"), (11L, "gamma")).toDF("doc_id", "text"),
      "doc_id", "text", store, accepted)

    val rows = spark.read.parquet(accepted)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "alpha"), (2L, "beta"), (11L, "gamma")))
    // the fingerprint store holds exactly one fp per distinct content
    val fps = store.read(spark).get.select("fp").collect().map(_.getString(0))
    assert(fps.length == 3 && fps.distinct.length == 3)
  }

  test("streaming front door: file source + AvailableNow processes drops exactly once") {
    val tmp = java.nio.file.Files.createTempDirectory("ingest_stream").toString
    val store = new ParquetStateStore(s"$tmp/fp")
    val accepted = s"$tmp/accepted"
    val dropDir = s"$tmp/drop"

    Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
      .write.mode("append").parquet(dropDir)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(dropDir)
    val q1 = IncrementalIngest.writer(stream, "doc_id", "text", store, accepted)
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q1.awaitTermination()

    // second drop arrives later, overlapping the first
    Seq((3L, "two"), (4L, "three")).toDF("doc_id", "text")
      .write.mode("append").parquet(dropDir)
    val q2 = IncrementalIngest.writer(spark.readStream
        .schema("doc_id LONG, text STRING").parquet(dropDir),
        "doc_id", "text", store, accepted)
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q2.awaitTermination()

    val texts = spark.read.parquet(accepted).select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(texts == Seq("one", "three", "two"))
  }
}
