package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the fifth round-7 operator batch: histogram-device
  * NTILE + perplexity bucketing, quality-aware cluster retention,
  * span-level contamination localization, Zipf rank-frequency fit.
  */
class Round7eOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // --------------------------------------------- PerplexityBuckets

  test("histogram-device ntile equals the builtin window ntile") {
    val rows = Seq(
      ("a", 3.5, 1L), ("a", 1.0, 2L), ("a", 1.0, 3L), ("a", 2.0, 4L),
      ("a", 9.0, 5L), ("a", 4.0, 6L), ("a", 0.5, 7L),
      ("b", 1.0, 8L), ("b", 2.0, 9L), ("b", 3.0, 10L), ("b", 4.0, 11L),
      ("c", 7.0, 12L))
    val df = rows.toDF("g", "v", "i")
    for (k <- Seq(2, 3, 4)) {
      val got = PerplexityBuckets
        .ntileByGroup(df, col("g"), col("v"), col("i"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val want = df.select(col("i"),
          ntile(k).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("g")).orderBy(col("v"), col("i"))).cast("bigint"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"k=$k")
    }
  }

  test("ntile distribution: leading tiles take the remainder, ties split by id") {
    // n=7, k=3 -> tile sizes 3,2,2; the two v=1.0 ties order by id
    val df = Seq(
      ("a", 1.0, 9L), ("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 3L),
      ("a", 4.0, 4L), ("a", 5.0, 5L), ("a", 6.0, 6L))
      .toDF("g", "v", "i")
    val got = PerplexityBuckets.ntileByGroup(df, col("g"), col("v"), col("i"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 1L, 9L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 3L))
  }

  test("ntile with fewer rows than tiles and repartition stability") {
    val df = Seq(("a", 5.0, 1L), ("a", 4.0, 2L)).toDF("g", "v", "i")
    val got = PerplexityBuckets.ntileByGroup(df, col("g"), col("v"), col("i"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(2L -> 1L, 1L -> 2L))
    val big = (1L to 100L).map(i => ("g", (i % 7).toDouble, i)).toDF("g", "v", "i")
    val a = PerplexityBuckets.ntileByGroup(big, col("g"), col("v"), col("i"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val b = PerplexityBuckets.ntileByGroup(big.repartition(7), col("g"), col("v"), col("i"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(a == b)
  }

  test("bucketize: thirds per language oriented tail->head by score") {
    val docs = (1L to 9L).map { i =>
      // three langs x three docs; doc text repetitiveness varies the
      // KN score deterministically
      val words = (1 to 6).map(j => s"w${(j + i) % (1 + i % 4)}").mkString(" ")
      (i, s"l${i % 3}", words + " " + words)
    }.toDF("doc_id", "lang", "text")
    val out = PerplexityBuckets.bucketize(docs, col("doc_id"), col("text"), col("lang"))
      .collect()
    assert(out.length == 9)
    val byLang = out.groupBy(_.getString(1))
    byLang.foreach { case (_, rows) =>
      assert(rows.map(_.getString(4)).sorted.toSeq == Seq("head", "middle", "tail"))
      val score = rows.map(r => r.getString(4) -> r.getDouble(3)).toMap
      assert(score("head") >= score("middle") && score("middle") >= score("tail"))
    }
  }

  // ----------------------------------------------------- Retention

  test("keepBest retains the max-quality member, ties to the smaller id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 7L))
      .toDF("id", "q")
    val got = Retention.keepBest(pairs, quality, col("id"), col("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 1L, 5L, false), (2L, 1L, 9L, true), (3L, 1L, 9L, false),
      (10L, 10L, 4L, false), (11L, 10L, 7L, true)))
  }

  test("keepBest: docs missing from the quality relation default to 0") {
    val pairs = Seq((5L, 6L)).toDF("id_a", "id_b")
    val quality = Seq((6L, -3L)).toDF("id", "q")
    val got = Retention.keepBest(pairs, quality, col("id"), col("q"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).sortBy(_._1)
    // 5 has quality 0 > 6's -3 -> 5 wins
    assert(got.toSeq == Seq((5L, 0L, true), (6L, -3L, false)))
  }

  test("keepBest: exactly one keeper per cluster on a planted corpus") {
    val docs = (1L to 40L).map { i =>
      val base = s"alpha beta gamma delta epsilon zeta eta theta iota kappa doc${i % 8}"
      (i, if (i % 2 == 0) base else base + s" unique$i tail$i")
    }.toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccard(docs, col("doc_id"), col("text"),
        blockBy = md5(substring(col("text"), 1, 20)), shingleK = 3, threshold = 0.3)
      .select(col("id_a"), col("id_b"))
    val quality = docs.select(col("doc_id").as("id"), length(col("text")).cast("bigint").as("q"))
    val out = Retention.keepBest(pairs, quality, col("id"), col("q"))
    val perCluster = out.groupBy(col("cluster_id"))
      .agg(sum(when(col("is_kept"), 1).otherwise(0)).as("nk"))
      .collect().map(_.getLong(1))
    assert(perCluster.nonEmpty && perCluster.forall(_ == 1L))
  }

  // ------------------------------------------- Decontaminate.spanHits

  test("spanHits localizes eval spans with 1-based positions and witnesses") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one two three four"), // shorter than k -> no spans
      (3L, "quick brown fox jumps over and quick brown fox jumps over again"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (100L, "xx quick brown fox jumps over yy"),
      (101L, "quick brown fox jumps over"))
      .toDF("doc_id", "text")
    val got = Decontaminate.spanHits(train, col("doc_id"), col("text"),
        eval, col("doc_id"), col("text"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: span at pos 2 ("quick brown fox jumps over"), both eval docs witness
    // doc 3: the same span at pos 1 and pos 7
    assert(got == Set(
      (1L, 2L, 100L), (1L, 2L, 101L),
      (3L, 1L, 100L), (3L, 1L, 101L), (3L, 7L, 100L), (3L, 7L, 101L)))
  }

  test("spanHits: clean corpora produce no rows, case/whitespace normalized") {
    val train = Seq((1L, "  Quick   BROWN fox Jumps over  ")).toDF("doc_id", "text")
    val evalHit = Seq((9L, "quick brown fox jumps over")).toDF("doc_id", "text")
    val evalMiss = Seq((9L, "entirely different words here now")).toDF("doc_id", "text")
    val hit = Decontaminate.spanHits(train, col("doc_id"), col("text"),
      evalHit, col("doc_id"), col("text"), k = 5).collect()
    val miss = Decontaminate.spanHits(train, col("doc_id"), col("text"),
      evalMiss, col("doc_id"), col("text"), k = 5).collect()
    assert(hit.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L)))
    assert(miss.isEmpty)
  }

  // ------------------------------------------------------- ZipfFit

  test("zipf fit matches hand-computed moments on a known corpus") {
    val df = Seq(("s", "a a a a b b c")).toDF("source", "text")
    val got = ZipfFit.fit(df, col("source"), col("text")).collect()(0)
    // freqs: a=4 (rank 1), b=2 (rank 2), c=1 (rank 3)
    val pts = Seq((1.0, 4.0), (2.0, 2.0), (3.0, 1.0)).map { case (r, c) =>
      (math.floor(math.log(r) * 1e6), math.floor(math.log(c) * 1e6))
    }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val (sxx, syy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._2 * p._2).sum)
    val num = n * sxy - sx * sy
    val (dx, dy) = (n * sxx - sx * sx, n * syy - sy * sy)
    def r4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    assert(got.getLong(1) == 3L && got.getLong(2) == 7L)
    assert(got.getDouble(3) == r4(num / dx))
    assert(got.getDouble(4) == r4(num / math.sqrt(dx * dy)))
    assert(got.getDouble(3) < 0.0) // frequency falls with rank
  }

  test("zipf: ties share a competition rank; degenerate sources fit null") {
    val df = Seq(
      ("t", "a a b b c"), // a,b tie at rank 1; c rank 3
      ("u", "a b c d")) // all freq 1 -> one shared rank -> no x variance
      .toDF("source", "text")
    val rows = ZipfFit.fit(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    val t = rows("t")
    // two distinct (rank, freq) points: (1, 2) with nc=2 and (3, 1)
    assert(t.getLong(1) == 3L && t.getLong(2) == 5L)
    assert(!t.isNullAt(3))
    val u = rows("u")
    assert(u.getLong(1) == 4L && u.isNullAt(3) && u.isNullAt(4))
  }

  // --------------------------------------------------- Md5Hash60Expr

  test("md5 hash60 kernel matches the composed conv/substring form") {
    val df = (1L to 500L).map(i => s"payload $i é中 stuff" * (1 + (i % 4).toInt))
      .toDF("s")
      .union(Seq("", " ", "exact").toDF("s"))
    val mismatches = df.select(
        Dedup.md5Hash60(col("s")).as("k"),
        Dedup.md5Hash60Composed(col("s")).as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(mismatches == 0L)
    val r = Seq(Option.empty[String]).toDF("s")
      .select(Dedup.md5Hash60(col("s"))).collect()(0)
    assert(r.isNullAt(0))
  }

  // ----------------------------------------------------- DedupEval

  test("lsh metrics equal the composed truth/candidate counts") {
    val docs = (1L to 30L).map { i =>
      val base = (1 to 12).map(j => s"tok${(j * i) % 5}").mkString(" ")
      val text = if (i % 3 == 0) docsFor(i - 1, 12) else base
      (i, text)
    }.toDF("doc_id", "text")
    val block = md5(substring(col("text"), 1, 10))
    val got = DedupEval.ophCandidateMetrics(docs, col("doc_id"), col("text"),
      block, shingleK = 3, numBins = 16, bands = 2, threshold = 0.4).collect()(0)
    val truth = Dedup.ngramJaccard(docs, col("doc_id"), col("text"), block, 3, 0.4)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.ophCandidates(docs, col("doc_id"), col("text"), 3, 16, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.getLong(0) == truth.size && got.getLong(1) == cand.size)
    assert(got.getLong(2) == (truth & cand).size)
    assert(got.getLong(3) == math.floor(1000.0 * (truth & cand).size / truth.size).toLong)
  }

  private def docsFor(i: Long, n: Int): String =
    (1 to n).map(j => s"tok${(j * i) % 5}").mkString(" ")

  test("lsh metrics: empty truth and candidate sets yield null ratios") {
    val docs = Seq((1L, "completely unique alpha beta gamma delta"),
      (2L, "nothing shared here at all zz yy xx ww")).toDF("doc_id", "text")
    val got = DedupEval.ophCandidateMetrics(docs, col("doc_id"), col("text"),
      md5(col("text")), 3, 16, 4, 0.5).collect()(0)
    assert(got.getLong(0) == 0L && got.getLong(1) == 0L)
    assert(got.isNullAt(3) && got.isNullAt(4))
  }

  // ------------------------------------------------ DomainReweight

  test("doremi step: equal distributions boost 1e6, weights track token share") {
    val df = Seq(
      ("a", "x y z x y z"), ("a", "x y z"),
      ("b", "x y z x y z x y z")).toDF("source", "text")
    val rows = DomainReweight.step(df, col("source"), col("text"), 200L)
      .collect().map(r => r.getString(0) -> r).toMap
    // identical unigram distributions -> equal ce -> excess 0 -> boost 1e6
    assert(rows("a").getLong(3) == 1000000L && rows("b").getLong(3) == 1000000L)
    // weights reduce to token shares: 9/18 each -> 500000 ppm
    assert(rows("a").getLong(4) == 500000L && rows("b").getLong(4) == 500000L)
  }

  test("doremi step: the worse-predicted source gets the bigger boost") {
    val df = Seq(
      ("common", "x x x x x x x x y y"),
      ("rare", "q r s t u v w q r s")).toDF("source", "text")
    val rows = DomainReweight.step(df, col("source"), col("text"), 200L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("rare").getLong(2) > rows("common").getLong(2)) // higher ce
    assert(rows("rare").getLong(3) > rows("common").getLong(3)) // bigger boost
    assert(rows("common").getLong(3) == 1000000L) // the min source
    val totalPpm = rows.values.map(_.getLong(4)).sum
    assert(totalPpm <= 1000000L && totalPpm > 999000L) // floor rounding only
  }

  test("doremi step: a single source takes the whole mixture") {
    val df = Seq(("only", "a b c a b c")).toDF("source", "text")
    val r = DomainReweight.step(df, col("source"), col("text"), 100L).collect()(0)
    assert(r.getLong(3) == 1000000L && r.getLong(4) == 1000000L)
  }

  // ------------------------------------------------ BpeTrain.fertility

  test("fertility aggregates encode's counts exactly, hand-checked ratios") {
    val df = Seq(
      (1L, "en", "ab ab cd"),
      (2L, "en", "ab cd"),
      (3L, "de", "ab ab ab")).toDF("doc_id", "lang", "text")
    val enc = BpeTrain.encode(df, col("doc_id"), col("text"), 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = BpeTrain.fertility(df, col("doc_id"), col("text"), col("lang"), 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val en = got("en")
    val enWords = enc(1L)._1 + enc(2L)._1
    val enToks = enc(1L)._2 + enc(2L)._2
    assert(en.getLong(1) == 2L && en.getLong(2) == enWords && en.getLong(3) == enToks)
    assert(en.getLong(4) == 8L + 5L) // chars of "ab ab cd" + "ab cd"
    assert(en.getLong(5) == math.floor(1000.0 * enToks / enWords).toLong)
    assert(en.getLong(6) == math.floor(1000.0 * 13 / enToks).toLong)
    // "ab" is the only mergeable pair corpus-wide -> 1 token; "cd" unmerged -> 2
    assert(got("de").getLong(3) == 3L)
  }

  // ---------------------------------------------- AnnEval / cellStats

  private def vecCorpus(n: Int, dim: Int = 8) =
    (1L to n.toLong).map { i =>
      (i, (1 to dim).map(j => (((i * j) % 7) - 3).toDouble).toArray)
    }.toDF("vec_id", "embedding")

  test("ivf recall@k: probing every cell recovers brute force exactly") {
    val corpus = vecCorpus(60)
    val query = vecCorpus(61).filter(col("vec_id") === 61L)
      .select(col("embedding").as("qv"))
    val full = AnnEval.ivfRecallAtK(corpus, col("vec_id"), col("embedding"),
      query, k = 4, iters = 2, nProbe = 4, topK = 10).collect()(0)
    assert(full.getLong(1) == 10L && full.getLong(2) == 10L && full.getLong(3) == 1000L)
    val pruned = AnnEval.ivfRecallAtK(corpus, col("vec_id"), col("embedding"),
      query, k = 4, iters = 2, nProbe = 1, topK = 10).collect()(0)
    assert(pruned.getLong(1) <= 10L && pruned.getLong(2) <= pruned.getLong(1))
    assert(pruned.getLong(3) == math.floor(100.0 * pruned.getLong(2)).toLong)
  }

  test("pq recall@k: a one-vector-per-cell codebook reproduces exact search") {
    // 16 vectors, k=16 centroids per subspace, deterministic seeding:
    // every vector is its own centroid in every subspace, so ADC
    // distance IS the exact quantized distance -> recall 1000
    val corpus = vecCorpus(16)
    val query = vecCorpus(17).filter(col("vec_id") === 17L)
      .select(col("embedding").as("qv"))
    val exact = AnnEval.pqRecallAtK(corpus, col("vec_id"), col("embedding"),
      query, dim = 8, m = 2, k = 16, iters = 2, topK = 5).collect()(0)
    assert(exact.getLong(1) == 5L && exact.getLong(2) == 5L && exact.getLong(3) == 1000L)
    // a coarser codebook can only do worse or equal
    val coarse = AnnEval.pqRecallAtK(vecCorpus(64), col("vec_id"), col("embedding"),
      query, dim = 8, m = 2, k = 2, iters = 2, topK = 5).collect()(0)
    val finer = AnnEval.pqRecallAtK(vecCorpus(64), col("vec_id"), col("embedding"),
      query, dim = 8, m = 2, k = 16, iters = 2, topK = 5).collect()(0)
    assert(coarse.getLong(3) <= finer.getLong(3))
  }

  test("ivf cell stats: occupancy sums to the corpus, imbalance exact") {
    val corpus = vecCorpus(80)
    val stats = IvfIndex.cellStats(corpus, col("vec_id"), col("embedding"),
      k = 4, iters = 2).collect()
    assert(stats.length == 4)
    val ns = stats.map(_.getLong(1))
    assert(ns.sum == 80L)
    val imb = math.floor(1000.0 * ns.max * 4 / 80).toLong
    assert(stats.forall(_.getLong(3) == imb))
    stats.foreach { r =>
      assert(r.getLong(2) == math.floor(1000.0 * r.getLong(1) / 80).toLong)
    }
  }

  test("ivf cell stats: a degenerate corpus collapses into one cell") {
    val corpus = (1L to 12L).map(i => (i, Array.fill(8)(1.0))).toDF("vec_id", "embedding")
    val stats = IvfIndex.cellStats(corpus, col("vec_id"), col("embedding"),
      k = 4, iters = 2).collect()
    val ns = stats.map(_.getLong(1)).sorted
    assert(ns.sum == 12L && ns.last == 12L && ns.init.forall(_ == 0L))
    assert(stats.forall(_.getLong(3) == 4000L))
  }

  // ---------------------------------------------------- ScriptMixExpr

  test("script mix kernel: hand-counted multiscript text, all classes") {
    val text = "Hi 42 你好 Привет مرحبا नमस्ते 안녕 é©" // latin, digit, cjk, cyr, ar, dev, hangul, ext-latin+other
    val r = Seq((1L, text)).toDF("doc_id", "text")
      .select(graft.plans.ScriptMixExprOps.mix(col("text")).as("st"))
      .select(col("st.*")).collect()(0)
    val get = graft.plans.ScriptMixOps.fields.zipWithIndex.map {
      case (f, i) => f -> r.getLong(i)
    }.toMap
    assert(get("n_latin") == 3L) // H i é (Latin-1 supplement counts as latin)
    assert(get("n_digit") == 2L)
    assert(get("n_cjk") == 2L)
    assert(get("n_cyrillic") == 6L)
    assert(get("n_arabic") == 5L)
    assert(get("n_devanagari") == 6L)
    assert(get("n_hangul") == 2L)
    assert(get("n_space") == 7L)
    assert(get("n_other") == 1L) // ©
    assert(get("n_total") == get("n_latin") + get("n_digit") + get("n_cjk") +
      get("n_cyrillic") + get("n_arabic") + get("n_devanagari") +
      get("n_hangul") + get("n_space") + get("n_other"))
  }

  test("script mix kernel matches the composed per-char classification") {
    val docs = Seq((1L, "mixed Текст with 漢字 and latin123"),
      (2L, ""), (3L, "plain ascii words here")).toDF("doc_id", "text")
    val kernel = docs
      .select(col("doc_id"), graft.plans.ScriptMixExprOps.mix(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_total"), col("st.n_latin"), col("st.n_cyrillic"),
        col("st.n_cjk"), col("st.n_digit"))
      .collect().map(r => r.getLong(0) -> (1 to 5).map(r.getLong)).toMap
    val composed = docs.select(col("doc_id"),
        posexplode(split(col("text"), "")))
      .filter(col("col") =!= "")
      .select(col("doc_id"), expr("ascii(col)").as("cp0"), col("col"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val cps = rows.map(_.getString(2).codePointAt(0))
        id -> IndexedSeq(cps.length.toLong,
          cps.count(c => graft.plans.ScriptMixOps.classify(c) == 1).toLong,
          cps.count(c => graft.plans.ScriptMixOps.classify(c) == 3).toLong,
          cps.count(c => graft.plans.ScriptMixOps.classify(c) == 2).toLong,
          cps.count(c => graft.plans.ScriptMixOps.classify(c) == 7).toLong)
      }
    composed.foreach { case (id, want) => assert(kernel(id) == want, s"doc $id") }
    assert(kernel(2L) == IndexedSeq(0L, 0L, 0L, 0L, 0L))
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(graft.plans.ScriptMixExprOps.mix(col("text"))).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  // ------------------------------------------- CorpusPipeline.funnel

  test("funnel attributes each doc to its FIRST failing stage") {
    val good = ("the quick brown fox jumps over the lazy dog and then " * 5).trim
    val docs = Seq(
      (1L, good), // kept
      (2L, good), // exact dup of 1 -> exact_dup
      (3L, "der die das und nicht mit sich auf ist im " * 12), // lang (de not allowed)
      (4L, "the of and short"), // quality (too short)
      (5L, good + " unique tail five five five"), // near-dup of 1 via pairs
      (6L, "the " + ("aa bb " * 60).trim)) // repetition? bigram aa bb dominates
      .toDF("doc_id", "text")
    val cfg = graft.ops.CorpusPipeline.Config(
      langs = Set("en"), minQuality = 2, maxTopBigramFrac = 0.4,
      prefixDedupK = None)
    val pairs = Seq((1L, 5L)).toDF("id_a", "id_b")
    val got = graft.ops.CorpusPipeline.funnel(docs, cfg, Some(pairs))
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got("lang")._1 == 1L)
    assert(got("quality")._1 == 1L)
    assert(got("repetition")._1 == 1L)
    assert(got("exact_dup")._1 == 1L)
    assert(got("prefix_dup")._1 == 0L)
    assert(got("near_dup")._1 == 1L)
    assert(got("kept")._1 == 1L)
    // conservation: every doc lands in exactly one stage
    assert(got.values.map(_._1).sum == 6L)
  }

  test("funnel: zero rows keep the stage table complete and ranked") {
    val docs = Seq((1L, ("english words common the and of to in is " * 12).trim))
      .toDF("doc_id", "text")
    val rows = graft.ops.CorpusPipeline.funnel(docs,
        graft.ops.CorpusPipeline.Config(langs = Set("en"), minQuality = 0))
      .orderBy(col("stage_rank")).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("lang", "quality", "repetition",
      "exact_dup", "prefix_dup", "near_dup", "kept"))
    assert(rows.map(_.getLong(2)).sum == 1L)
  }

  test("zipf fit is repartition-stable") {
    val docs = (1L to 60L).map { i =>
      (s"s${i % 3}", (1 to 12).map(j => s"w${(i * j) % 9}").mkString(" "))
    }.toDF("source", "text")
    val a = ZipfFit.fit(docs, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val b = ZipfFit.fit(docs.repartition(13), col("source"), col("text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(a == b)
  }
}
