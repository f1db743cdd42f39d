package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CorpusPipelineSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private lazy val base =
    graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"), col("source")).persist()

  // near-exact duplicates of every 5th doc (marker token appended):
  // exact dedup must NOT catch them, near-dup clustering must
  private def withPlanted = base.union(
    base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"), col("source")))

  private val cfg = CorpusPipeline.Config(
    langs = Set("en", "de", "fr", "es"), // keep everything lang-wise
    minQuality = 0,                      // keep everything quality-wise
    nearDupThreshold = 0.5)

  test("planted near-duplicates are removed; their originals survive") {
    val out = CorpusPipeline.prepare(withPlanted, cfg).persist()
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val plantedAll = withPlanted.filter(col("doc_id") >= 500000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plantedSurvived = ids.filter(_ >= 500000L)
    // a short doc + marker token can legitimately fall under the
    // jaccard threshold, so demand bulk removal, not perfection
    assert(plantedSurvived.size <= plantedAll.size / 5,
      s"${plantedSurvived.size} of ${plantedAll.size} planted dups survived")
    // exact-dedup invariant holds on the final output: no two
    // surviving rows share identical text
    assert(out.select(countDistinct(col("text"))).first().getLong(0) == out.count())
    // survivors are a nonempty subset of the input
    assert(ids.nonEmpty && ids.size < withPlanted.count())
  }

  test("decontamination drops eval-overlapping docs; repetition cap drops loopy docs") {
    // eval set = the texts of docs 0..9 → those docs are 100%
    // contaminated with themselves and must be dropped
    val eval = base.filter(col("doc_id") < 10).select(col("text"))
    val out = CorpusPipeline.prepare(base, cfg, evalSet = Some(eval),
      contaminationFrac = 0.8)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(base.filter(col("doc_id") < 10).select("doc_id")
      .collect().map(_.getLong(0)).forall(!ids.contains(_)))
    assert(ids.nonEmpty)

    // a degenerate "w w w ... w" doc has top_bigram_frac 1.0 and must
    // fall to the repetition cap, while normal docs survive it
    val loopy = base.limit(0).union(
      Seq((999999L, Seq.fill(50)("w").mkString(" "), "web")).toDF("doc_id", "text", "source"))
    val capped = CorpusPipeline.prepare(base.union(loopy),
      cfg.copy(maxTopBigramFrac = 0.5))
    val cappedIds = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!cappedIds.contains(999999L))
    assert(cappedIds.nonEmpty)
  }

  test("pipeline output is deterministic and consistently packed") {
    val a = CorpusPipeline.prepare(withPlanted, cfg)
      .select("doc_id", "chunk_id", "start_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = CorpusPipeline.prepare(withPlanted, cfg)
      .select("doc_id", "chunk_id", "start_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)

    // packing invariant: within a shard, offsets are the running sum
    // of token counts in doc_id order
    val out = CorpusPipeline.prepare(withPlanted, cfg)
    val rows = out.select("source", "doc_id", "n_tokens", "start_offset")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.foldLeft(0L) { case (expectedOff, (_, _, n, off)) =>
        assert(off == expectedOff)
        expectedOff + n
      }
    }
  }

  test("sampling stage composes: fraction < 1 yields a strict reproducible subset") {
    val full = CorpusPipeline.prepare(withPlanted, cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = CorpusPipeline.prepare(withPlanted, cfg.copy(sampleFraction = 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(full))
    assert(half.size < full.size && half.nonEmpty)
  }
}
