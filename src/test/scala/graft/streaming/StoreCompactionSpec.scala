package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.GtfsRtPipeline.ParquetStateStore

/** D5 wired into the streaming stores: a long-running ingest must
  * keep its fingerprint/signature/band stores at a BOUNDED file
  * count (the per-batch appends otherwise add one file set per
  * batch) while cross-batch dedup results stay bit-identical to an
  * uncompacted run.
  */
class StoreCompactionSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def parquetFiles(dir: String): Int =
    graft.util.StoreFs.listFilesRecursive(dir).count(_._1.endsWith(".parquet"))

  private def batchDocs(b: Int) = {
    // every batch re-sends two old contents (cross-batch dups) and
    // adds two new ones; near-dup via shared shingles
    val base = b * 10L
    Seq(
      (base + 1, s"the quick brown fox jumps over lazy dog number $b"),
      (base + 2, s"the quick brown fox jumps over lazy dog number $b"), // in-batch dup
      (base + 3, "shared boilerplate header that every batch repeats verbatim"),
      (base + 4, s"fresh unique content string for batch $b with extra words")
    ).toDF("doc_id", "text")
  }

  test("near-dup ingest: 25 batches, store file count bounded, results identical") {
    val tmpA = java.nio.file.Files.createTempDirectory("ndc_a").toString
    val tmpB = java.nio.file.Files.createTempDirectory("ndc_b").toString
    var maxFilesA = 0
    for (b <- 1 to 25) {
      IncrementalNearDup.ingestBatch(batchDocs(b), "doc_id", "text",
        s"$tmpA/sig", s"$tmpA/band", s"$tmpA/accepted", maxStoreFiles = 6)
      IncrementalNearDup.ingestBatch(batchDocs(b), "doc_id", "text",
        s"$tmpB/sig", s"$tmpB/band", s"$tmpB/accepted", maxStoreFiles = 0)
      maxFilesA = math.max(maxFilesA,
        math.max(parquetFiles(s"$tmpA/sig"), parquetFiles(s"$tmpA/band")))
    }
    // bounded: the budget plus at most one batch's worth of appends
    // before the next trigger fires
    val slack = 6 + spark.sparkContext.defaultParallelism
    assert(maxFilesA <= slack, s"store file count $maxFilesA exceeded bound $slack")
    // the uncompacted twin really does grow past the bound (the
    // hazard is real, not hypothetical)
    assert(parquetFiles(s"$tmpB/sig") > 6)
    // identical dedup decisions
    def acceptedIds(p: String) =
      spark.read.parquet(s"$p/accepted").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    assert(acceptedIds(tmpA) == acceptedIds(tmpB))
    // and the compacted store still DEDUPES: replaying batch 1 under a
    // fresh id range accepts nothing
    val replay = batchDocs(1)
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
    IncrementalNearDup.ingestBatch(replay, "doc_id", "text",
      s"$tmpA/sig", s"$tmpA/band", s"$tmpA/accepted", maxStoreFiles = 6)
    assert(acceptedIds(tmpA).forall(_ < 100000L))
  }

  test("versioned state store: compaction + retention bound total files") {
    val tmp = java.nio.file.Files.createTempDirectory("vss").toString
    val store = new ParquetStateStore(s"$tmp/st",
      compactEvery = 4, targetFileBytes = 32L * 1024 * 1024, keepVersions = 3)
    var maxTotal = 0
    for (v <- 1 to 25) {
      // grow the state the way ingest does: prior ∪ new rows
      val add = Seq((v.toLong, s"fp$v")).toDF("k", "fp")
      val next = store.read(spark) match {
        case Some(p) => p.union(add)
        case None => add
      }
      store.write(next, appliedTag = Some(v.toString))
      maxTotal = math.max(maxTotal, parquetFiles(s"$tmp/st"))
    }
    // retention keeps <= keepVersions version dirs
    val versions = graft.util.StoreFs.listNames(s"$tmp/st").filter(_.startsWith("v="))
    assert(versions.length <= 3, s"retention failed: $versions")
    // every 4th version compacts, so per-version files stay near the
    // input partition count and the total under keepVersions times it
    assert(maxTotal <= 3 * (4 * 2 + 2), s"total file count $maxTotal unbounded")
    // state is complete and the applied tag survived compaction
    val latest = store.read(spark).get.collect()
    assert(latest.length == 25)
    assert(store.lastAppliedTag.contains("25"))
  }

  test("compaction crash window heals: .old restored on recover") {
    val tmp = java.nio.file.Files.createTempDirectory("heal").toString
    val table = s"$tmp/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(table)
    // simulate dying between the two renames: data sits at .old
    graft.util.StoreFs.rename(table, table + ".old")
    graft.ops.Compaction.recover(table)
    assert(spark.read.parquet(table).count() == 2)
  }
}
