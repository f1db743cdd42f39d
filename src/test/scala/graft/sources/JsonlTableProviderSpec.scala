package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class JsonlTableProviderSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("format(graft-jsonl) roundtrip through the registered short name") {
    val dir = Files.createTempDirectory("graft_dsv2").toString + "/out"
    JsonlCorpus.write((1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text"), dir,
      maxRecordsPerFile = 10)
    val back = spark.read.format("graft-jsonl").schema(docSchema).load(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      (1L to 40L).map(i => (i, s"doc $i")).toSet)
    // sharded writer -> one partition per shard file
    assert(back.rdd.getNumPartitions >= 4)
  }

  test("explicit schema is required; inference refuses") {
    val dir = Files.createTempDirectory("graft_dsv2").toString + "/out"
    JsonlCorpus.write(Seq((1L, "x")).toDF("doc_id", "text"), dir)
    val e = intercept[Exception](spark.read.format("graft-jsonl").load(dir).collect())
    assert(e.getMessage.contains("explicit read schema"))
  }

  test("column pruning reaches the scan; filters show as pushed and results verify") {
    val dir = Files.createTempDirectory("graft_dsv2").toString + "/out"
    JsonlCorpus.write((1L to 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text"), dir)
    val pruned = spark.read.format("graft-jsonl").schema(docSchema).load(dir)
      .filter(col("doc_id") > 15L).select(col("doc_id"))
    val plan = planOf(pruned)
    assert(plan.contains("graft-jsonl"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,15)]"), plan)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(16L, 17L, 18L, 19L, 20L))
    // count(*) prunes every column and still counts all lines
    assert(spark.read.format("graft-jsonl").schema(docSchema).load(dir).count() == 20L)
  }

  test("corrupt lines quarantine in _corrupt_record, clean rows parse") {
    val dir = Files.createTempDirectory("graft_dsv2").toString
    val f = new java.io.PrintWriter(dir + "/shard.jsonl")
    f.println("""{"doc_id": 1, "text": "ok one"}""")
    f.println("""{"doc_id": 2 "text": "missing comma"}""")
    f.println("""not json at all""")
    f.println("""{"doc_id": 3, "text": "ok two"}""")
    f.close()

    val withCorrupt = docSchema.add(StructField(JsonlCorpus.CorruptCol, StringType))
    val all = spark.read.format("graft-jsonl").schema(withCorrupt)
      .load(dir + "/shard.jsonl")
    val clean = all.filter(col(JsonlCorpus.CorruptCol).isNull)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val bad = all.filter(col(JsonlCorpus.CorruptCol).isNotNull)
      .select(JsonlCorpus.CorruptCol).collect().map(_.getString(0))
    assert(bad.length == 2 && bad.exists(_.contains("missing comma")))
  }

  test("gzip shards stream-decode") {
    val dir = Files.createTempDirectory("graft_dsv2").toString
    val gz = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(dir + "/shard.jsonl.gz")))
    (1L to 5L).foreach(i => gz.println(s"""{"doc_id": $i, "text": "gz $i"}"""))
    gz.close()
    val got = spark.read.format("graft-jsonl").schema(docSchema).load(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (1L to 5L).map(i => (i, s"gz $i")).toSet)
  }
}
