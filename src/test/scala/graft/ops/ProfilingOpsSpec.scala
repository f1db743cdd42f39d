package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.JsonlCorpus

/** Specs for BPE pair scoring, equi-depth histograms, column
  * profiling, and the JSONL corpus source.
  */
class ProfilingOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ----------------------------------------------------------- BpePairs

  test("bpe pair scores: weighted by word frequency, positions across distinct words") {
    // corpus: "abab abab cd" -> words: abab(x2), cd(x1)
    // abab pairs: ab(pos1), ba(pos2), ab(pos3) -> ab:2 positions, ba:1
    // weighted: ab 2*2=4, ba 1*2=2, cd 1*1=1
    val docs = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val got = BpePairs.topPairs(docs, col("text"), k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("ab", 2L, 4L), ("ba", 1L, 2L), ("cd", 1L, 1L)))
  }

  test("bpe pairs: single-char words are skipped, ordering breaks ties by pair") {
    val docs = Seq((1L, "a b c xy xz")).toDF("doc_id", "text")
    val got = BpePairs.topPairs(docs, col("text"), k = 10).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("xy", 1L), ("xz", 1L)))
  }

  // ---------------------------------------------------------- EquiDepth

  test("partitioned prefix-sum variant equals the single-window histogram") {
    // wide + skewed + negative domain: exercises coarse-range splits
    val df = ((1L to 300L).map(i => i * 1000003L) ++ Seq.fill(50)(-7L) ++
        (1L to 40L).map(_ => 42L))
      .map(Tuple1(_)).toDF("x")
    for (b <- Seq(1, 4, 16)) {
      val a = EquiDepth.histogram(df, col("x"), b)
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      val p = EquiDepth.histogramPartitioned(df, col("x"), b)
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      assert(a == p, s"buckets=$b")
    }
  }

  test("partitioned variant survives a full-bigint span (no Long wrap in the coarse key)") {
    // lo near Long.MinValue, hi near Long.MaxValue: (hi-lo) and (v-lo)
    // would wrap; the halved-arithmetic coarse key must stay monotone
    val df = (Seq(Long.MinValue + 1, Long.MinValue / 2, -1000L, 0L, 999L,
        Long.MaxValue / 2, Long.MaxValue - 1) ++ Seq.fill(30)(5L))
      .map(Tuple1(_)).toDF("x")
    for (b <- Seq(1, 3, 8)) {
      val a = EquiDepth.histogram(df, col("x"), b)
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      val p = EquiDepth.histogramPartitioned(df, col("x"), b)
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      assert(a == p, s"buckets=$b")
    }
  }

  test("histogramAuto picks by distinct count and matches both variants") {
    val df = ((1L to 500L).map(i => i * 7919L) ++ Seq.fill(40)(13L)).map(Tuple1(_)).toDF("x")
    val base = EquiDepth.histogram(df, col("x"), 8)
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    // cutoff above the distinct count -> single-window branch
    val single = EquiDepth.histogramAuto(df, col("x"), 8, distinctCutoff = 1000000L)
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    // cutoff below the distinct count -> partitioned branch
    val parted = EquiDepth.histogramAuto(df, col("x"), 8, distinctCutoff = 10L)
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(single == base && parted == base)
  }

  test("equi-depth histogram: near-equal bucket depths, values never split") {
    // 100 rows of value i%10 -> 10 distinct values x 10 rows
    val df = (0 until 100).map(i => i % 10).toDF("x")
    val got = EquiDepth.histogram(df, col("x"), buckets = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // cum_before for v: v*10; bucket = v*10*5/100 = v/2 -> pairs (0,1)->0 ...
    assert(got == Map(
      0L -> ((20L, 2L, 0L, 1L)), 1L -> ((20L, 2L, 2L, 3L)), 2L -> ((20L, 2L, 4L, 5L)),
      3L -> ((20L, 2L, 6L, 7L)), 4L -> ((20L, 2L, 8L, 9L))))
  }

  test("equi-depth: one dominant value owns its bucket(s); totals preserved") {
    val df = (Seq.fill(90)(7) ++ (1 to 10)).toDF("x")   // 7 x90 (+1 from range), rest x1
    val got = EquiDepth.histogram(df, col("x"), buckets = 4).collect()
    assert(got.map(_.getLong(1)).sum == 100L)
    // the skewed value 7 sits in exactly one bucket
    val with7 = got.filter(r => r.getLong(3) <= 7 && 7 <= r.getLong(4))
    assert(with7.length == 1 && with7.head.getLong(1) >= 91L)
  }

  // ----------------------------------------------------------- Profiler

  test("column profile: nulls, distincts, min/max as strings, one row per column") {
    val df = Seq(
      (1L, Some("en"), 10L),
      (2L, None, 20L),
      (3L, Some("de"), 20L)
    ).toDF("id", "lang", "n")
    val got = Profiler.profile(df, Seq("id", "lang", "n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("id") == ((3L, 0L, 3L, "1", "3")))
    assert(got("lang") == ((3L, 1L, 2L, "de", "en")))
    assert(got("n") == ((3L, 0L, 2L, "10", "20")))
  }

  // ------------------------------------------------------ RetrievalEval

  test("retrieval metrics: hand-computed recall/mrr/ndcg, zero-hit and no-qrel queries") {
    val rankings = Seq(
      (1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L),   // q1 hits doc 2 at rank 2
      (2L, 8L, 1L), (2L, 9L, 2L),                 // q2: no relevant docs retrieved
      (9L, 1L, 1L)                                // q9 has no qrels -> omitted
    ).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 2L), (1L, 5L), (1L, 7L), (2L, 4L)).toDF("query_id", "doc_id")

    val got = RetrievalEval.metrics(rankings, qrels, k = 10).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

    def g(rank: Long): Long = math.floor(1e6 / (math.log(rank + 1.0) / math.log(2.0))).toLong
    val ndcg1 = BigDecimal(g(2).toDouble / (g(1) + g(2) + g(3)).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((3L, 1L, 0.3333, 0.5, ndcg1)))
    assert(got(2L) == ((1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("retrieval metrics: duplicate qrel pairs do not inflate hits or recall") {
    val rankings = Seq((1L, 2L, 1L), (1L, 3L, 2L)).toDF("query_id", "doc_id", "rank")
    // (1,2) relevant pair listed twice — must count once
    val qrels = Seq((1L, 2L), (1L, 2L), (1L, 5L)).toDF("query_id", "doc_id")
    val r = RetrievalEval.metrics(rankings, qrels, k = 10).collect().head
    assert(r.getLong(1) == 2L, "n_relevant counts distinct pairs")
    assert(r.getLong(2) == 1L, "n_hits counts the hit once")
    assert(r.getDouble(3) == 0.5, "recall_at_k stays <= 1")
  }

  test("retrieval metrics: perfect ranking scores 1.0 across the board") {
    val rankings = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 10L), (1L, 11L)).toDF("query_id", "doc_id")
    val r = RetrievalEval.metrics(rankings, qrels, k = 10).collect().head
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) == ((1.0, 1.0, 1.0)))
  }

  // ----------------------------------------------------- IncrementalAgg

  test("incremental merge equals one-shot aggregation, including sketch bytes") {
    val full = (1L to 200L).map(i => (s"g${i % 3}", i % 40, i % 17)).toDF("g", "v", "k")
    val b1 = full.filter(col("v") < 20)
    val b2 = full.filter(col("v") >= 20)

    val merged = IncrementalAgg.merge(
      IncrementalAgg.aggregate(b1, col("g"), col("v"), col("k")),
      IncrementalAgg.aggregate(b2, col("g"), col("v"), col("k")))
    val oneShot = IncrementalAgg.aggregate(full, col("g"), col("v"), col("k"))

    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getAs[Array[Byte]](5).toSeq)
    }.toSet
    assert(key(merged) == key(oneShot))

    // estimates view decodes the sketch
    val est = IncrementalAgg.estimates(merged).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(est.keySet == Set("g0", "g1", "g2") && est.values.forall(e => e > 0 && e <= 17))
  }

  test("incremental merge is order- and batching-insensitive") {
    val full = (1L to 90L).map(i => (s"g${i % 2}", i, i % 5)).toDF("g", "v", "k")
    val parts = Seq(0L, 1L, 2L).map(m =>
      IncrementalAgg.aggregate(full.filter(pmod(col("v"), lit(3)) === m),
        col("g"), col("v"), col("k")))
    val a = IncrementalAgg.merge(parts: _*)
    val b = IncrementalAgg.merge(parts.reverse: _*)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getAs[Array[Byte]](5).toSeq)
    }.toSet
    assert(key(a) == key(b))
  }

  // ------------------------------------------------------- Cooccurrence

  test("pmi pairs: hand-counted window-2 co-occurrences and exact pmi arithmetic") {
    // doc: "a b a" -> d1 pairs: (a,b),(b,a); d2 pairs: (a,a)
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val got = Cooccurrence.pmiPairs(docs, col("text"), window = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

    // pair stream: (a,b) (b,a) (a,a) -> t=3; c1: a=2,b=1; c2: a=2,b=1
    def pmi(c12: Long, c1: Long, c2: Long): Double =
      math.floor(math.log(3.0 * c12 / (c1 * c2)) * 1e6) / 1e6
    assert(got.keySet == Set(("a", "b"), ("b", "a"), ("a", "a")))
    assert(got(("a", "b")) == ((1L, BigDecimal(pmi(1, 2, 1)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(("a", "a")) == ((1L, BigDecimal(pmi(1, 2, 2)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("pmi pairs: collocations outrank independent pairs") {
    // "x y" always adjacent; "p"/"q" scattered independently
    val docs = (1 to 30).map(i => (i.toLong, s"x y filler$i p other$i q")).toDF("doc_id", "text")
    val got = Cooccurrence.pmiPairs(docs, col("text"), window = 2, k = 200).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got(("x", "y")) > got(("p", "other1")))
  }

  // ----------------------------------------------------------- RateLimit

  test("rate limit: first n per key per hour survive, deterministic tiebreak") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val df = Seq(
      (1L, 7L, ts(1)), (2L, 7L, ts(2)), (3L, 7L, ts(3)), (4L, 7L, ts(4)), // user 7: 4 in hour
      (5L, 7L, ts(70)),                                                   // next hour resets
      (6L, 8L, ts(1)), (7L, 8L, ts(1))                                    // same ts: id tiebreak
    ).toDF("event_id", "user_id", "ts")
    val kept = RateLimit.keepFirstNPerHour(df, col("user_id"), col("ts"), col("event_id"), n = 2)
      .select("event_id", "seq").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept == Map(1L -> 1L, 2L -> 2L, 5L -> 1L, 6L -> 1L, 7L -> 2L))
  }

  // -------------------------------------------------------------- Mixing

  test("weighted interleave: every prefix approximates the weight mixture") {
    val docs = (1L to 300L).map(i => (s"s${i % 3}", i)).toDF("source", "doc_id")
    val mixed = Mixing.interleave(docs, col("source"), col("doc_id"),
        Map("s0" -> 1, "s1" -> 2, "s2" -> 3))
      .orderBy(col("vkey"), col("source"), col("src_rank"))
      .collect().map(_.getString(0))
    // first 60 positions: s2 (w=3) appears ~3x as often as s0 (w=1)
    val prefix = mixed.take(60).groupBy(identity).view.mapValues(_.length).toMap
    assert(prefix("s2") > 2 * prefix("s0"))
    assert(prefix("s1") > prefix("s0") && prefix("s2") > prefix("s1"))
  }

  test("weighted interleave: vkey arithmetic is exact and rank-deterministic") {
    val docs = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("source", "doc_id")
    val got = Mixing.interleave(docs, col("source"), col("doc_id"), Map("a" -> 2))
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got(("a", 1L)) == 500000L && got(("a", 2L)) == 1000000L)
    assert(got(("b", 1L)) == 1000000L) // missing source defaults to weight 1
  }

  // -------------------------------------------------------- JsonlCorpus

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("jsonl roundtrip preserves rows; maxRecordsPerFile bounds shard size") {
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/out"
    val df = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    JsonlCorpus.write(df, dir, maxRecordsPerFile = 10)
    val back = JsonlCorpus.readClean(spark, dir, docSchema)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      (1L to 50L).map(i => (i, s"doc $i")).toSet)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".json"))
    assert(files >= 5)
  }

  test("schema-evolved corpus: old shards null-fill new columns, no rewrite needed") {
    val root = Files.createTempDirectory("graft_evolve").toString
    // generation 1: (doc_id, text)
    (1L to 10L).map(i => (i, s"old $i")).toDF("doc_id", "text")
      .write.parquet(root + "/gen1")
    // generation 2 adds a quality column
    (11L to 20L).map(i => (i, s"new $i", i * 0.1)).toDF("doc_id", "text", "quality")
      .write.parquet(root + "/gen2")

    val all = JsonlCorpus.readEvolved(spark, root + "/gen1", root + "/gen2")
    assert(all.columns.toSet == Set("doc_id", "text", "quality"))
    assert(all.count() == 20L)
    val old = all.filter(col("doc_id") <= 10L)
    assert(old.filter(col("quality").isNull).count() == 10L)
    val newRows = all.filter(col("doc_id") === 15L).collect()
    assert(newRows.head.getAs[Double]("quality") == 1.5)
  }

  test("corrupt jsonl lines are quarantined, clean rows survive") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val f = new java.io.PrintWriter(dir + "/shard.jsonl")
    f.println("""{"doc_id": 1, "text": "ok one"}""")
    f.println("""{"doc_id": 2 "text": "missing comma"}""")
    f.println("""not json at all""")
    f.println("""{"doc_id": 3, "text": "ok two"}""")
    f.close()

    val clean = JsonlCorpus.readClean(spark, dir + "/shard.jsonl", docSchema)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val bad = JsonlCorpus.readCorrupt(spark, dir + "/shard.jsonl", docSchema)
      .collect().map(_.getString(0))
    assert(bad.length == 2 && bad.exists(_.contains("missing comma")))
  }
}
