package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.plans.UnicodeNormalizeOps

/** Specs for the third round-7 operator batch: PII scrubbing, Unicode
  * NFC/NFKC canonicalization, Hamilton proportional stratified
  * sampling.
  */
class Round7cOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ----------------------------------------------------------- Scrub

  private def redact(rows: Seq[(Long, String)]) =
    Scrub.redactPii(rows.toDF("id", "text"), col("id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("redactPii: emails, IPs and digit runs masked with per-stage counts") {
    val got = redact(Seq(
      1L -> "write a.b+c%d@sub.example.co or x_1@y.io today",
      2L -> "host 192.168.0.1 and 10.0.255.77 up",
      3L -> "ref 123456 and 9999 but not 123",
      4L -> "clean text with no pii at all"))
    assert(got(1L) == (("write <EMAIL> or <EMAIL> today", 2L, 0L, 0L)))
    assert(got(2L) == (("host <IP> and <IP> up", 0L, 2L, 0L)))
    assert(got(3L) == (("ref <NUM> and <NUM> but not 123", 0L, 0L, 2L)))
    assert(got(4L) == (("clean text with no pii at all", 0L, 0L, 0L)))
  }

  test("redactPii: staged counting never double-counts digits inside an email or IP") {
    val got = redact(Seq(1L -> "mail 12345@ids.example.com ip 10.20.30.40 plain 55555"))
    // the email eats its 5-digit local part; the IP eats its octets;
    // only the bare run remains for the <NUM> stage
    assert(got(1L) == (("mail <EMAIL> ip <IP> plain <NUM>", 1L, 1L, 1L)))
  }

  test("redactPii: word boundaries keep short digit groups and non-IP dots intact") {
    val got = redact(Seq(1L -> "v1.2.3.4x is a version not an ip, 1.2 stays"))
    // 1.2.3.4 is flanked by word chars (v…x) -> \b fails on both sides
    assert(got(1L)._1 == "v1.2.3.4x is a version not an ip, 1.2 stays")
    assert(got(1L)._3 == 0L)
  }

  // --------------------------------------------- UnicodeNormalizeExpr

  private def nfcOne(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(UnicodeNormalizeOps.nfc(col("t"))).head().getString(0)

  private def nfkcOne(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(UnicodeNormalizeOps.nfkc(col("t"))).head().getString(0)

  test("nfc: combining marks compose; composed input is returned unchanged") {
    assert(nfcOne("cafe\u0301") == "caf\u00e9")
    assert(nfcOne("nai\u0308ve") == "na\u00efve")
    assert(nfcOne("caf\u00e9") == "caf\u00e9")
    assert(nfcOne("plain ascii") == "plain ascii")
  }

  test("nfc: idempotent, and length shrinks by exactly the composed marks") {
    val raw = "a\u0301e\u0301 x"
    val once = nfcOne(raw)
    assert(once == "\u00e1\u00e9 x")
    assert(nfcOne(once) == once)
    assert(raw.codePointCount(0, raw.length) - once.codePointCount(0, once.length) == 2)
  }

  test("nfkc folds compatibility forms NFC must preserve") {
    // U+FB01 LATIN SMALL LIGATURE FI, U+FF12 FULLWIDTH DIGIT TWO
    assert(nfkcOne("\ufb01le \uff12x") == "file 2x")
    assert(nfcOne("\ufb01le \uff12x") == "\ufb01le \uff12x")
  }

  test("unicode normalize: null-safe and interpreted == codegen") {
    val df = Seq(Some("cafe\u0301"), None).toDF("t")
    val got = df.select(UnicodeNormalizeOps.nfc(col("t"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("caf\u00e9", null))
    // interpreted path (no codegen): same result via direct eval
    import org.apache.spark.unsafe.types.UTF8String
    assert(UnicodeNormalizeOps.normalize(UTF8String.fromString("cafe\u0301"), "NFC")
      .toString == "caf\u00e9")
  }

  // ---------------------------------------------------------- PqIndex

  private def pqCorpus(n: Int, dim: Int): Seq[(Long, Seq[Double])] =
    (1 to n).map { i =>
      // 4 well-separated cluster centers per subspace + small jitter
      val c = i % 4
      i.toLong -> Seq.tabulate(dim)(d =>
        c * 2.0 + math.sin(i * 0.37 + d) * 0.15)
    }

  test("pq: encode matches a driver-side argmin against the learned codebooks") {
    val rows = pqCorpus(40, 16)
    val df = rows.toDF("vec_id", "embedding")
    val cb = PqIndex.fitCodebooks(df, col("vec_id"), col("embedding"),
      dim = 16, m = 4, k = 4, iters = 2)
    val got = PqIndex.encode(df, col("vec_id"), col("embedding"), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.foreach { case (id, v) =>
      val qv = v.map(x => math.floor(x * cb.scale).toLong).toArray
      (0 until cb.m).foreach { s =>
        val sub = qv.slice(s * cb.subDim, (s + 1) * cb.subDim)
        val dists = cb.books(s).map(c =>
          c.zip(sub).map { case (a, b) => val d = b - a; d * d }.sum)
        val want = dists.indexOf(dists.min)
        assert(got(id)(s) == want, s"id=$id sub=$s")
      }
    }
  }

  test("pq: adc distance is the exact LUT sum; a corpus copy of the query ranks first") {
    val rows = pqCorpus(40, 16)
    val qv = rows.head._2.toArray // vector 1 doubles as the query
    val df = rows.toDF("vec_id", "embedding")
    val cb = PqIndex.fitCodebooks(df, col("vec_id"), col("embedding"), 16, 4, 4, 2)
    val codes = PqIndex.encode(df, col("vec_id"), col("embedding"), cb)
    val top = PqIndex.adcTopK(codes, qv, cb, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver reference for every returned distance
    val qq = qv.map(x => math.floor(x * cb.scale).toLong)
    val codeMap = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    top.foreach { case (id, dist) =>
      val want = (0 until cb.m).map { s =>
        val cent = cb.books(s)(codeMap(id)(s))
        cent.indices.map { d =>
          val diff = qq(s * cb.subDim + d) - cent(d); diff * diff
        }.sum
      }.sum
      assert(dist == want, s"id=$id")
    }
    // the query's own copy holds the per-sub minimum in every subspace
    assert(top.head._1 == 1L)
    // and PQ recall vs exact: its cluster-mates (i%4==1) fill the top 10
    assert(top.map(_._1).count(id => id % 4 == 1) == 10)
  }

  test("ivfPq: equals ADC restricted to the probed cells; full probe equals plain ADC") {
    val rows = pqCorpus(60, 16)
    val df = rows.toDF("vec_id", "embedding")
    val coarse = IvfIndex.fitIntegerPortable(df, col("vec_id"),
      col("embedding"), k = 4, iters = 2)
    val cb = PqIndex.fitCodebooks(df, col("vec_id"), col("embedding"), 16, 4, 4, 2)
    val qv = rows(2)._2.toArray
    // nProbe = all cells -> identical to plain ADC over everything
    val full = PqIndex.ivfPqTopK(df, col("vec_id"), col("embedding"),
        coarse, cb, qv, nProbe = 4, topK = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val plain = PqIndex.adcTopK(
        PqIndex.encode(df, col("vec_id"), col("embedding"), cb), qv, cb, 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(full == plain)
    // nProbe = 1: equals ADC over exactly the rows assigned to that cell
    val one = PqIndex.ivfPqTopK(df, col("vec_id"), col("embedding"),
        coarse, cb, qv, nProbe = 1, topK = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val qq = qv.map(x => math.floor(x * 1000L).toLong)
    val bestCell = coarse.zipWithIndex.map { case (c, i) =>
      (c.zip(qq).map { case (a, b) => val d = b - a; d * d }.sum, i)
    }.min._2
    val inCell = df.filter(IvfIndex.cellOfInt(
        IvfIndex.quantized(col("embedding"), 1000L), coarse) === bestCell)
    val manual = PqIndex.adcTopK(
        PqIndex.encode(inCell, col("vec_id"), col("embedding"), cb), qv, cb, 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(one == manual && one.nonEmpty)
  }

  test("ivfPq persisted index: probe equals the in-flight composition and prunes partitions") {
    val rows = pqCorpus(60, 16)
    val df = rows.toDF("vec_id", "embedding")
    val coarse = IvfIndex.fitIntegerPortable(df, col("vec_id"),
      col("embedding"), k = 4, iters = 2)
    val cb = PqIndex.fitCodebooks(df, col("vec_id"), col("embedding"), 16, 4, 4, 2)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_index").toString + "/idx"
    PqIndex.writeIvfPqIndex(df, col("vec_id"), col("embedding"), path, coarse, cb)

    val qv = rows(2)._2.toArray
    val probed = PqIndex.probeIvfPqIndex(spark, path, qv, coarse, cb,
      nProbe = 2, topK = 12)
    val inFlight = PqIndex.ivfPqTopK(df, col("vec_id"), col("embedding"),
        coarse, cb, qv, nProbe = 2, topK = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(probed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == inFlight)
    assert(inFlight.nonEmpty)
    // the cell filter reaches the scan as a PartitionFilter — only the
    // probed cell directories are read; the float vectors are not in
    // the index at all
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected partition pruning on cell, plan:\n$plan")
    assert(!spark.read.parquet(path).columns.contains("embedding"))
  }

  test("pq: fused one-pass codebook fit is bit-identical to independent per-sub fits") {
    val rows = pqCorpus(50, 16)
    val df = rows.toDF("vec_id", "embedding")
    val fused = PqIndex.fitCodebooks(df, col("vec_id"), col("embedding"), 16, 4, 4, 3)
    (0 until 4).foreach { s =>
      val solo = IvfIndex.fitIntegerPortable(df, col("vec_id"),
        slice(col("embedding").cast("array<double>"), s * 4 + 1, 4), k = 4, iters = 3)
      assert(fused.books(s).map(_.toSeq).toSeq == solo.map(_.toSeq).toSeq, s"sub=$s")
    }
  }

  test("pq: deterministic under repartitioning") {
    val rows = pqCorpus(60, 16)
    def run(parts: Int) = {
      val df0 = rows.toDF("vec_id", "embedding")
      val df = if (parts > 1) df0.repartition(parts) else df0
      val cb = PqIndex.fitCodebooks(df, col("vec_id"), col("embedding"), 16, 4, 4, 2)
      PqIndex.adcTopK(PqIndex.encode(df, col("vec_id"), col("embedding"), cb),
          rows(5)._2.toArray, cb, 15)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(run(1) == run(9))
  }

  // ------------------------------------------------- PhraseMatchExpr

  private def phraseCounts(text: String, phrases: Seq[String]): Seq[Long] =
    Seq(Tuple1(text)).toDF("t")
      .select(graft.plans.PhraseMatchExpr.counts(col("t"), phrases))
      .head().getSeq[Long](0)

  /** Naive reference: count every start position (overlapping). */
  private def refCounts(text: String, phrases: Seq[String]): Seq[Long] = {
    val s = text.toLowerCase
    phrases.map(_.toLowerCase).map { p =>
      (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length)).toLong
    }
  }

  test("phraseCounts: overlapping occurrences, shared affixes, fail-link hits") {
    // "aa" occurs twice in "aaa" (overlap); "ab"+"bc" both end inside "abc"
    assert(phraseCounts("aaa abc", Seq("aa", "ab", "bc", "abc")) == Seq(2L, 1L, 1L, 1L))
    // phrase spanning a token boundary, at start and at end
    assert(phraseCounts("table scan x table scan", Seq("table scan")) == Seq(2L))
    // case-insensitive; absent phrase zero
    assert(phraseCounts("Fast MERGE", Seq("fast merge", "nope")) == Seq(1L, 0L))
  }

  test("phraseCounts: equals the naive position scan on generated text") {
    val rnd = new scala.util.Random(7)
    val alpha = Seq("a", "b", "ab", "ba", "aab", "bab", "abba")
    (1 to 30).foreach { _ =>
      val text = Seq.fill(40)(if (rnd.nextBoolean()) 'a' else 'b').mkString
      assert(phraseCounts(text, alpha) == refCounts(text, alpha), s"text=$text")
    }
  }

  test("phraseCounts: null-safe, distributed over a corpus column") {
    val df = Seq((1L, Some("x agg row y")), (2L, None), (3L, Some("agg row agg row")))
      .toDF("id", "t")
    val got = df.select(col("id"),
        graft.plans.PhraseMatchExpr.counts(col("t"), Seq("agg row")))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(got(1L) == Seq(1L) && got(2L) == null && got(3L) == Seq(2L))
  }

  // ------------------------------------------------------ Diagnostics

  private def skew(rows: Seq[(Long, String)], topN: Int, parts: Int = 1) = {
    val df0 = rows.toDF("id", "k")
    Diagnostics.keySkew(if (parts > 1) df0.repartition(parts) else df0, col("k"), topN)
  }

  test("keySkew: hand-computed heavy keys, percentiles and top share") {
    // counts: a=6, b=3, c=1, d=1, e=1 -> n_keys=5, n_rows=12, max=6
    val rows =
      (1 to 6).map(i => (i.toLong, "a")) ++ (7 to 9).map(i => (i.toLong, "b")) ++
        Seq((10L, "c"), (11L, "d"), (12L, "e"))
    val got = skew(rows, 2).orderBy("rank").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 6L), (2L, "b", 3L)))
    val r0 = got(0)
    assert(r0.getLong(3) == 5L && r0.getLong(4) == 12L && r0.getLong(5) == 6L)
    // sizes sorted: [1,1,1,3,6]; nearest-rank: p50 -> ceil(2.5)=3rd -> 1,
    // p90 -> ceil(4.5)=5th -> 6, p99 -> 5th -> 6
    assert(r0.getLong(6) == 1L && r0.getLong(7) == 6L && r0.getLong(8) == 6L)
    // top share: (6+3)*1000 // 12 = 750
    assert(r0.getLong(9) == 750L)
  }

  test("keySkew: boundary ties cut by key hash, stable under repartitioning") {
    // b, c, d all have count 2 -> the topN=2 cut keeps 'a' (count 3)
    // plus whichever tied key hashes smallest
    val rows = Seq("a", "a", "a", "b", "b", "c", "c", "d", "d")
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
    val a = skew(rows, 2).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val tied = Seq("b", "c", "d").minBy(k =>
      Seq(Tuple1(k)).toDF("k").select(Dedup.md5Hash60(col("k"))).head().getLong(0))
    assert(a == Set((1L, "a"), (2L, tied)))
    val b = skew(rows, 2, parts = 5).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("keySkew: topN beyond key cardinality returns every key, share 1000") {
    val rows = Seq((1L, "x"), (2L, "y"), (3L, "y"))
    val got = skew(rows, 10).orderBy("rank").collect()
    assert(got.length == 2)
    assert(got(0).getLong(9) == 1000L)
    assert(got(0).getString(1) == "y" && got(1).getString(1) == "x")
  }

  // --------------------------------------------------------- BpeTrain

  /** Sequential reference BPE (Sennrich): word-freq table, best pair
    * by (count desc, lhs asc, rhs asc), greedy left-to-right merge.
    */
  private def refBpe(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    def greedyMerge(syms: List[String], l: String, r: String): List[String] = syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: greedyMerge(rest, l, r)
      case a :: rest => a :: greedyMerge(rest, l, r)
      case Nil => Nil
    }
    var seqs: Map[List[String], Long] = texts
      .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.length >= 2)
      .groupBy(identity).map { case (w, xs) => w.map(_.toString).toList -> xs.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- seqs; p <- syms.sliding(2) if p.size == 2)
        counts((p.head, p(1))) = counts.getOrElse((p.head, p(1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, cnt))
        seqs = seqs.toSeq.map { case (syms, c) => greedyMerge(syms, l, r) -> c }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
        rank += 1
      }
    }
    out.toSeq
  }

  private def learn(texts: Seq[String], n: Int, parts: Int = 1) = {
    val df0 = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    BpeTrain.learnMerges(if (parts > 1) df0.repartition(parts) else df0, col("text"), n)
      .collect().map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3))).toSeq
  }

  test("bpeTrain: matches the sequential reference on the classic corpus") {
    val texts = Seq("low lower lowest", "low low newer newest", "newer wider low")
    val got = learn(texts, 8)
    assert(got == refBpe(texts, 8))
    assert(got.size == 8)
    // learned units actually compound: some merge consumes a prior merge
    assert(got.exists { case (_, l, r, _) => l.length > 1 || r.length > 1 })
  }

  test("bpeTrain: greedy left-to-right non-overlapping merge (aaaa -> aa,aa)") {
    val texts = Seq("aaaa aaaa bb")
    val got = learn(texts, 2)
    assert(got == refBpe(texts, 2))
    // merge 1 is (a,a) with 6 weighted positions (3 per word occurrence x2);
    // merge 2 must be (aa,aa) — proving "aaaa" merged to [aa,aa], not [a,aa,a]
    assert(got(0)._2 == "a" && got(0)._3 == "a")
    assert(got(1)._2 == "aa" && got(1)._3 == "aa")
  }

  test("bpeTrain: deterministic under repartitioning and early-stops when exhausted") {
    val texts = Seq("ab ab cd", "ab cd cd ef")
    assert(learn(texts, 5) == learn(texts, 5, parts = 7))
    // every word collapses to one symbol after 3 merges -> early stop
    val got = learn(texts, 10)
    assert(got == refBpe(texts, 10))
    assert(got.size == 3)
  }

  // ------------------------------------------------------- Allocation

  /** Driver-side Hamilton reference: (stratum -> alloc). */
  private def hamilton(counts: Map[String, Long], k: Long): Map[String, Long] = {
    val n = counts.values.sum
    val base = counts.map { case (s, c) => s -> (k * c / n) }
    val rem = counts.map { case (s, c) => s -> (k * c % n) }
    val leftover = k - base.values.sum
    val extra = counts.keys.toSeq
      .sortBy(s => (-rem(s), s))
      .take(leftover.toInt).toSet
    counts.map { case (s, c) =>
      s -> math.min(c, base(s) + (if (extra(s)) 1L else 0L))
    }
  }

  private def corpus(counts: Map[String, Int]) = {
    val rows = counts.toSeq.sortBy(_._1).flatMap { case (s, n) =>
      (0 until n).map(i => (s.hashCode.toLong * 1000 + i, s))
    }
    rows.toDF("doc_id", "lang")
  }

  test("proportionalSample: allocations are Hamilton-exact and sum to k") {
    val counts = Map("a" -> 7, "b" -> 2, "c" -> 1)
    val df = corpus(counts)
    val got = Allocation.proportionalSample(df, col("doc_id"), col("lang"), 5)
    val alloc = got.select("stratum", "alloc").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = hamilton(counts.map { case (s, n) => s -> n.toLong }, 5L)
      .filter(_._2 > 0)
    assert(alloc == want)
    assert(got.count() == 5)
  }

  test("proportionalSample: selects exactly the hash-smallest ids per stratum") {
    val counts = Map("x" -> 20, "y" -> 10)
    val df = corpus(counts)
    val k = 9
    val got = Allocation.proportionalSample(df, col("doc_id"), col("lang"), k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = hamilton(counts.map { case (s, n) => s -> n.toLong }, k.toLong)
    // reference: per stratum, take alloc_h smallest by (md5h, id)
    val byHash = df.select(col("lang"), col("doc_id"),
        Dedup.md5Hash60(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expect = byHash.toSeq.flatMap { case (s, rows) =>
      rows.toSeq.sortBy(r => (r._3, r._2)).take(want(s).toInt).map(r => (s, r._2))
    }.toSet
    assert(got == expect)
  }

  // ------------------------------------------------------------ TfIdf

  private def tfidfPairs(rows: Seq[(Long, String)], maxDf: Int = 10, tau: Double = 0.0) =
    TfIdf.similarPairs(rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
      shingleK = 3, maxDf = maxDf, threshold = tau)

  test("tfidf: exact duplicate pair scores cosine ~1, higher than partial overlap") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    // doc 4 keeps the (1,3) shared shingles' df below N, so their idf
    // stays positive (df == N terms weigh 0 — correct tf-idf behavior)
    val rows = Seq(1L -> a, 2L -> a,
      3L -> "alpha beta gamma delta other words here now",
      4L -> "wholly unrelated filler content sentence tokens")
    val got = tfidfPairs(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-9)
    assert(got((1L, 3L)) > 0.0 && got((1L, 3L)) < got((1L, 2L)))
    assert(got((1L, 3L)) == got((2L, 3L))) // same shingle sets -> same cosine
  }

  test("tfidf: cosine matches a driver-side reference on a hand fixture") {
    val rows = Seq(
      1L -> "red fox jumps over lazy dog",
      2L -> "red fox jumps over sleepy cat",
      3L -> "completely different tokens in this document body")
    val got = tfidfPairs(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // reference: shingle sets, df, idf_milli = floor(1000*ln((N+1)/(df+1)))
    def shingles(t: String) = t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val sets = rows.toMap.map { case (id, t) => id -> shingles(t) }
    val n = rows.size
    val df = sets.values.flatten.toSeq.groupBy(identity).map { case (s, xs) => s -> xs.size }
    def idf(s: String) = math.floor(1000.0 * math.log((n + 1.0) / (df(s) + 1.0))).toLong
    def nsq(id: Long) = sets(id).toSeq.map(s => idf(s) * idf(s)).sum
    for (((ia, ib), (dot, cos)) <- got) {
      val common = sets(ia) & sets(ib)
      val wantDot = common.toSeq.map(s => idf(s) * idf(s)).sum
      assert(dot == wantDot, s"pair ($ia,$ib)")
      val wantCos = wantDot.toDouble / (math.sqrt(nsq(ia).toDouble) * math.sqrt(nsq(ib).toDouble))
      assert(math.abs(cos - wantCos) < 1e-9, s"pair ($ia,$ib)")
    }
    assert(got.contains((1L, 2L)) && !got.contains((1L, 3L)))
  }

  test("tfidf: shingles above maxDf never pair documents") {
    // the only shared shingle appears in ALL 6 docs -> df=6 > maxDf=5
    val boiler = "common boiler plate"
    val rows = (1L to 6L).map(i => i -> s"$boiler unique$i tail$i words$i")
    val got = tfidfPairs(rows, maxDf = 5, tau = 0.0)
    assert(got.count() == 0)
    // raising the cap re-admits them
    assert(tfidfPairs(rows, maxDf = 6, tau = 0.0).count() == 15)
  }

  test("tfidf: deterministic under repartitioning") {
    val rows = (1L to 30L).map(i =>
      i -> s"tok${i % 7} tok${i % 5} tok${i % 3} body word$i extra${i % 4} more${i % 11}")
    val df1 = tfidfPairs(rows).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val df2 = TfIdf.similarPairs(rows.toDF("doc_id", "text").repartition(13),
        col("doc_id"), col("text"), 3, 10, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(df1 == df2 && df1.nonEmpty)
  }

  test("proportionalSample: stable under repartitioning; k >= N takes everything") {
    val counts = Map("a" -> 6, "b" -> 3)
    val df = corpus(counts)
    val a = Allocation.proportionalSample(df, col("doc_id"), col("lang"), 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = Allocation.proportionalSample(df.repartition(7), col("doc_id"), col("lang"), 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    val all = Allocation.proportionalSample(df, col("doc_id"), col("lang"), 9)
    assert(all.count() == 9)
    val allocs = all.select("stratum", "alloc").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(allocs == Map("a" -> 6L, "b" -> 3L))
  }
}
