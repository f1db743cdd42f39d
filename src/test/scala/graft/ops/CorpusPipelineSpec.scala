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

  test("url curation stages: canonical dups collapse, domain caps bound volume, prefix screen fires") {
    // three docs share one canonical url (case/utm/fragment noise);
    // domain big.com gets 12 distinct pages (cap 3); two docs share a
    // 5-token prefix with distinct endings (prefix screen k=5)
    // every text carries English stopwords: the pipeline's langId
    // stage runs BEFORE url curation and drops unclassifiable docs
    val big = (100L to 111L).map(i =>
      // the page NUMBER sits inside the first 5 tokens so the k=5
      // prefix screen does not also fire on these
      (i, s"the page $i body of number and with filler words attached", "s",
        s"https://big.com/p$i"))
      .toDF("doc_id", "text", "source", "url")
    val all = Seq(
      (1L, "the quick brown fox and one lazy dog of night", "s", "https://Dup.com/page?utm_a=1"),
      (2L, "some other text body here and the entirely new stuff of it", "s", "HTTPS://dup.com/page#frag"),
      (3L, "the third body of text again and fully unique words", "s", "https://dup.com/page"),
      (20L, "the quick brown fox and aardvark wolf zebra of day", "s", "https://pfx.com/a"),
      (21L, "an unrelated content entirely different with words here of now", "s", "https://pfx.com/b"))
      .toDF("doc_id", "text", "source", "url").union(big)

    val out = CorpusPipeline.prepare(all,
        cfg.copy(maxDocsPerDomain = Some(3), prefixDedupK = Some(5),
          nearDupThreshold = 0.95),
        urlCol = Some("url"))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    assert(out.contains(1L) && !out.contains(2L) && !out.contains(3L),
      "canonical-url dups keep the smallest doc_id only")
    assert(out.count(id => id >= 100L && id <= 111L) == 3, "domain cap bounds big.com to 3")
    // doc 1 and 20 share the 5-token prefix: 20 dropped by the screen
    assert(!out.contains(20L) && out.contains(21L), "prefix screen keeps min-id only")
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
