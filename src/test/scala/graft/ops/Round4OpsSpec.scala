package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the round-4 operators: fuzzy join, range join, z-order
  * layout, contamination, BM25, repetition metrics.
  */
class Round4OpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ---------------------------------------------------------------- FuzzyJoin

  test("fuzzy self-join finds within-block pairs at bounded edit distance") {
    val names = Seq("kitten", "sitting", "mitten", "kitchen", "apple")
      .toDF("name").withColumn("blk", lit(1))
    val pairs = FuzzyJoin.selfJoin(names, col("name"), col("name"), col("blk"), maxDist = 3)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // kitten↔mitten = 1, kitten↔sitting = 3, kitten↔kitchen = 2,
    // mitten↔sitting = 3 (m→s, +ing −en → s-i-t-t-i-n-g vs m-i-t-t-e-n: sub m→s, sub e→i, ins g = 3),
    // kitchen↔mitten = 3 (k→m, drop c, h→t? kitchen→mitten: sub k→m, del c, sub h→t = 3); apple matches nothing.
    assert(pairs.contains(("kitten", "mitten", 1L)))
    assert(pairs.contains(("kitten", "sitting", 3L)))
    assert(pairs.contains(("kitchen", "kitten", 2L)))
    assert(!pairs.exists(p => p._1 == "apple" || p._2 == "apple"))
    // every reported pair is within the bound and ordered
    assert(pairs.forall { case (a, b, d) => a < b && d <= 3 })
  }

  test("fuzzy join blocks: cross-block pairs are never compared, plan has no nested loop") {
    val names = Seq(("kitten", 1), ("mitten", 2)).toDF("name", "blk")
    val pairs = FuzzyJoin.selfJoin(names, col("name"), col("name"), col("blk"), maxDist = 3)
    assert(pairs.count() == 0) // dist 1 but different blocks
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  // ---------------------------------------------------------------- RangeJoin

  test("range join equals the naive inequality join, incl. boundaries and multi-cell intervals") {
    val points = (0L to 100L).map(i => (i, i * 7L)).toDF("pid", "pos")
    val intervals = Seq(
      (1L, 0L, 10L),     // short, within one cell
      (2L, 10L, 10L),    // degenerate [10,10] — boundary inclusive
      (3L, 95L, 410L),   // spans many cells
      (4L, 699L, 701L),  // data edge
      (5L, 800L, 900L))  // past all points
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, col("pos"), intervals, col("lo"), col("hi"),
        cellWidth = 50L)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.crossJoin(intervals)
      .filter(col("pos").between(col("lo"), col("hi")))
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.exists(_._1 == 3L)) // the multi-cell interval matched
    assert(!got.exists(_._1 == 5L)) // the out-of-range interval did not
  }

  test("range join plans as an equi-join on the cell, not a nested loop") {
    val points = (0L to 100L).map(i => (i, i * 7L)).toDF("pid", "pos")
    val intervals = Seq((1L, 0L, 100L)).toDF("iid", "lo", "hi")
    val joined = RangeJoin.pointInInterval(points, col("pos"), intervals,
      col("lo"), col("hi"), cellWidth = 50L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("range join handles negative positions (floor semantics)") {
    val points = Seq((1L, -75L), (2L, -50L), (3L, -1L), (4L, 0L)).toDF("pid", "pos")
    val intervals = Seq((1L, -60L, -10L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, col("pos"), intervals,
        col("lo"), col("hi"), cellWidth = 50L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L)) // only -50 ∈ [-60, -10]
  }

  // ---------------------------------------------------------------- ZOrder

  test("zValue2 interleaves bits (known values)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (63L, 63L))
      .toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y"), 6).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(3=011, 5=101): x bits at even, y bits at odd →
    // 1 + 2 + 4 + 32 = 39; (63,63) → 0xFFF = 4095
    assert(got == Seq(0L, 1L, 2L, 39L, 4095L))
  }

  test("z-ordered layout clusters box queries into fewer files than single-column layout") {
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("bigint").as("y"))
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.writeZOrdered(grid, ZOrder.zValue2(col("x"), col("y"), 6), s"$tmp/z", numFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$tmp/linear_x")

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("y") < 8) // selective in y only
        .select(input_file_name()).distinct().count()

    val zFiles = filesTouched(s"$tmp/z")
    val linearFiles = filesTouched(s"$tmp/linear_x")
    // clustered writes default to zstd (visible in the file names)
    assert(new java.io.File(s"$tmp/z").listFiles()
      .exists(_.getName.endsWith(".zstd.parquet")))
    // x-sorted layout spreads every y across all files; z-order
    // confines y<8 to the low-z files.
    assert(linearFiles >= 12, s"linear layout touched $linearFiles")
    assert(zFiles <= 8, s"z-order layout touched $zFiles files")
  }

  // ---------------------------------------------------------------- Compaction

  test("compaction merges small files shuffle-free and preserves the data") {
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = spark.range(4096).selectExpr("id", "id % 7 AS k")
    df.repartition(64).write.parquet(tmp)
    val before = spark.read.parquet(tmp).inputFiles.length
    assert(before >= 32)
    val (b, a) = Compaction.compact(spark, tmp, targetFileBytes = 256 * 1024)
    assert(b == before && a < before)
    val back = spark.read.parquet(tmp)
    assert(back.inputFiles.length == a)
    assert(back.count() == 4096)
    assert(back.selectExpr("sum(id)").first().getLong(0) == 4096L * 4095 / 2)
    // idempotent once at/below target
    val (b2, a2) = Compaction.compact(spark, tmp, targetFileBytes = 256 * 1024)
    assert(b2 == a && a2 == a)
  }

  // ---------------------------------------------------------------- Contamination

  test("contamination overlap counts shared distinct shingles against the eval set") {
    val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e f"),     // identical → all 4 shingles shared
      (2L, "a b c d x y"),     // shares shingles "a b c", "b c d"
      (3L, "p q r s t u"))     // disjoint
      .toDF("doc_id", "text")
    val got = Contamination.overlap(corpus, col("doc_id"), col("text"),
        eval, col("text"), shingleK = 3, minFrac = 0.5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4))).toSeq
    // "a b c d e f" has 4 distinct 3-shingles
    assert(got == Seq((1L, 4L, 4L, 1), (2L, 4L, 2L, 1), (3L, 4L, 0L, 0)))
  }

  test("contamination broadcasts the eval vocabulary (no corpus-side shuffle of text)") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val eval = Sampling.hashSample(docs, col("doc_id"), 0.1)
    val plan = Contamination.overlap(docs, col("doc_id"), col("text"),
      eval, col("text"), 3, 0.5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ---------------------------------------------------------------- BM25

  test("bm25 matches a hand-computed score and ranks by relevance") {
    // 4 docs, equal length 4 tokens → dl/avgdl = 1 exactly.
    val docs = Seq(
      (1L, "spark spark x y"), // tf(spark)=2
      (2L, "spark a b c"),     // tf(spark)=1
      (3L, "p q r s"),
      (4L, "t u v w"))
      .toDF("doc_id", "text")
    val queries = Seq(("q1", "spark")).toDF("query_id", "term")
    val got = Bm25.topK(docs, col("doc_id"), col("text"), queries, k1 = 1.2, b = 0.75, topK = 10)
      .orderBy("rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got.map(_._2) == Seq(1L, 2L)) // higher tf ranks first; non-matching docs absent
    def score(tf: Double): Double = {
      val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
      val s = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * 1.0))
      BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(got(0)._3 - score(2)) < 1e-9)
    assert(math.abs(got(1)._3 - score(1)) < 1e-9)
  }

  test("bm25 sums contributions over multi-term queries") {
    val docs = Seq(
      (1L, "alpha beta x y"),
      (2L, "alpha c d e"),
      (3L, "beta f g h"))
      .toDF("doc_id", "text")
    val queries = Seq(("q1", "alpha"), ("q1", "beta")).toDF("query_id", "term")
    val got = Bm25.topK(docs, col("doc_id"), col("text"), queries, topK = 10)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got.head._1 == 1L) // the doc matching both terms wins
    assert(got.size == 3)
    assert(got(0)._2 > got(1)._2)
  }

  test("bm25 semi-join fallback (vocab over the literal cap) matches the fast path") {
    val docs = Seq(
      (1L, "alpha beta x y"),
      (2L, "alpha c d e"),
      (3L, "beta f g h"))
      .toDF("doc_id", "text")
    val queries = Seq(("q1", "alpha"), ("q1", "beta")).toDF("query_id", "term")
    def run(cap: Int) =
      Bm25.topK(docs, col("doc_id"), col("text"), queries, topK = 10,
          maxLiteralVocab = cap)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(x => (x._1, x._4)).toSeq
    assert(run(1) == run(100000), "forced fallback must score identically")
  }

  // ---------------------------------------------------------------- Repetition

  test("repetition metrics: counts and fractions on hand-built docs") {
    val metrics = TextAnalysis.repetitionMetrics(col("text")).map { case (n, c) => c.as(n) }
    val got = Seq((1L, "a a a b"), (2L, "x"), (3L, "u v w u v"))
      .toDF("doc_id", "text")
      .select(col("doc_id") +: metrics: _*)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    // "a a a b": toks 4, distinct 2, bigrams [a a, a a, a b] → max 2, frac 2/3
    assert(got(0) == ((1L, 4L, 2L, 0.5, 3L, 2L, 0.6667)))
    // "x": one token, no bigrams, fractions 0
    assert(got(1) == ((2L, 1L, 1L, 0.0, 0L, 0L, 0.0)))
    // "u v w u v": toks 5, distinct 3, bigrams [u v, v w, w u, u v] → max 2, 0.5
    assert(got(2) == ((3L, 5L, 3L, 0.4, 4L, 2L, 0.5)))
  }

  // ---------------------------------------------------------------- Resample

  test("resample ffills a regular grid per key; sub-step keys drop; instant ties break by tie-break") {
    val ev = Seq(
      // key 1: obs at 5 (two rows — tie broken by max event_id), 12, 25
      (1L, 5L, 1.0, 100L), (1L, 5L, 9.9, 200L), (1L, 12L, 2.0, 300L), (1L, 25L, 3.0, 400L),
      // key 2: span [15,18] contains no multiple of 10 → absent
      (2L, 15L, 7.0, 500L), (2L, 18L, 8.0, 600L))
      .toDF("user_id", "us", "value", "event_id")
    val got = Resample.resampleFfill(ev, "user_id", "us", "value", "event_id", stepUs = 10L)
      .orderBy("user_id", "slot_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 10L, 9.9), (1L, 20L, 2.0)))
  }

  test("resample grid starts at the first aligned slot inside the span (no null fills)") {
    val ev = Seq((1L, 10L, 1.0, 1L), (1L, 40L, 2.0, 2L)).toDF("user_id", "us", "value", "event_id")
    val got = Resample.resampleFfill(ev, "user_id", "us", "value", "event_id", stepUs = 10L)
      .orderBy("slot_us")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((10L, 1.0), (20L, 1.0), (30L, 1.0), (40L, 2.0)))
  }

  // ---------------------------------------------------------------- PII audit

  test("pii audit counts urls, emails, ipv4s, digit runs") {
    val cols = TextCleaner.piiCounts(col("text")).map { case (n, c) => c.as(n) }
    val got = Seq(
      (1L, "visit https://x.example.com or mail a@b.co from 10.0.0.1 acct 12345678"),
      (2L, "just plain words with a short 123 number"))
      .toDF("doc_id", "text")
      .select(col("doc_id") +: cols: _*)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSeq
    assert(got == Seq((1L, 1L, 1L, 1L, 1L, 1), (2L, 0L, 0L, 0L, 0L, 0)))
  }

  test("repetition kernel interpreted path (direct eval) matches expectations") {
    import org.apache.spark.unsafe.types.UTF8String
    val row = graft.plans.RepetitionOps.compute(UTF8String.fromString("A a a b"))
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) == ((4L, 2L, 3L, 2L)))
    val empty = graft.plans.RepetitionOps.compute(UTF8String.fromString(""))
    assert((empty.getLong(0), empty.getLong(2)) == ((1L, 0L))) // one empty token, no bigrams
  }

  test("repetition kernel matches the HOF baseline on real documents") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents").limit(100)
    def grab(cols: Seq[(String, org.apache.spark.sql.Column)]) =
      docs.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
    val kernel = grab(TextAnalysis.repetitionMetrics(col("text"))
      .filter { case (n, _) => !n.endsWith("_frac") })
    val hof = grab(TextAnalysis.repetitionMetricsHof(col("text")))
    assert(kernel == hof)
  }

  test("repetition metrics plan is a zero-shuffle narrow map") {
    val metrics = TextAnalysis.repetitionMetrics(col("text")).map { case (n, c) => c.as(n) }
    val df = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id") +: metrics: _*)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("term-counts kernel matches the explode formulation on real documents") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents").limit(100)
    def grab(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "term")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val kernel = grab(TextAnalysis.termFrequencies(docs, col("doc_id"), col("text")))
    val explode = grab(TextAnalysis.termFrequenciesExplode(docs, col("doc_id"), col("text")))
    assert(kernel == explode)
    // edge cases: empty text and repeated whitespace
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "  a  a b  "), (3L, "A a\ta")).toDF("doc_id", "text")
    val k = grab(TextAnalysis.termFrequencies(edge, col("doc_id"), col("text")))
    val e = grab(TextAnalysis.termFrequenciesExplode(edge, col("doc_id"), col("text")))
    assert(k == e)
    assert(k.contains((3L, "a", 3L))) // case folding + tab split
  }

  test("term-counts kernel makes per-doc tf a zero-shuffle narrow map") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val tf = TextAnalysis.termFrequencies(docs, col("doc_id"), col("text"))
    assert(!tf.queryExecution.executedPlan.toString.contains("Exchange"),
      tf.queryExecution.executedPlan.toString)
    // and it is registered for the SQL passthrough surface
    graft.functions.GraftFunctions.register(spark)
    docs.limit(5).createOrReplaceTempView("tc_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, explode(graft_term_counts(lower(text))) AS (term, tf) FROM tc_docs")
    assert(viaSql.count() > 0)
  }
}
