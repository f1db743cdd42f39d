package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** File-skipping manifest: correctness of pruned reads and the actual
  * file-count reduction on a clustered layout.
  */
class SkippingIndexSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_skip").toString

  test("pruned read touches few files on a range-clustered layout and matches a full scan") {
    val dir = tmpDir() + "/t"
    val df = (1L to 10000L).map(i => (i, i % 97, s"p$i")).toDF("v", "m", "payload")
    // range-clustered on v -> per-file v-ranges are disjoint
    df.repartitionByRange(16, col("v")).sortWithinPartitions("v")
      .write.parquet(dir)

    val manifest = SkippingIndex.writeManifest(spark, dir, Seq("v", "m"))

    val candidates = SkippingIndex.candidateFiles(spark, manifest, "v", 4000L, 4400L)
    val totalFiles = SkippingIndex.stats(spark, dir, Seq("v")).count()
    assert(totalFiles == 16L)
    assert(candidates.nonEmpty && candidates.size <= 2,
      s"expected <=2 candidate files, got ${candidates.size}")

    val pruned = SkippingIndex.prunedRead(spark, dir, manifest, "v", 4000L, 4400L)
      .select("v", "m", "payload").collect().map(_.toSeq).toSet
    val full = spark.read.parquet(dir)
      .filter(col("v") >= 4000L && col("v") <= 4400L)
      .select("v", "m", "payload").collect().map(_.toSeq).toSet
    assert(pruned == full && pruned.size == 401)
  }

  test("unclustered column prunes nothing (every file is a candidate) but stays correct") {
    val dir = tmpDir() + "/t"
    (1L to 5000L).map(i => (i, i % 97)).toDF("v", "m")
      .repartitionByRange(8, col("v")).sortWithinPartitions("v")
      .write.parquet(dir)
    val manifest = SkippingIndex.writeManifest(spark, dir, Seq("v", "m"))
    // m spans [0, 96] in every file -> no skipping possible
    assert(SkippingIndex.candidateFiles(spark, manifest, "m", 10L, 11L).size == 8)
    val got = SkippingIndex.prunedRead(spark, dir, manifest, "m", 10L, 11L).count()
    assert(got == 5000L / 97 * 2 + 2)
  }

  test("empty candidate set yields an empty, schema-correct result") {
    val dir = tmpDir() + "/t"
    (1L to 100L).map(i => (i, s"x$i")).toDF("v", "s")
      .repartitionByRange(4, col("v")).write.parquet(dir)
    val manifest = SkippingIndex.writeManifest(spark, dir, Seq("v"))
    val out = SkippingIndex.prunedRead(spark, dir, manifest, "v", 1000L, 2000L)
    assert(out.columns.toSeq == Seq("v", "s") && out.count() == 0L)
  }
}
