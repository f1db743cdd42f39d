package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the fourth round-7 operator batch: robust per-group
  * outlier gating (median/MAD from the histogram device) and
  * cross-corpus semantic decontamination.
  */
class Round7dOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // -------------------------------------------------------- Outliers

  test("percentileByGroup matches the builtin interpolated percentile") {
    val rows = Seq(
      ("a", 1L), ("a", 7L), ("a", 7L), ("a", 2L), ("a", 9L),
      ("b", 10L), ("b", 20L), ("b", 30L), ("b", 40L),
      ("c", 5L))
    val df = rows.toDF("g", "v")
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val got = Outliers.percentileByGroup(df, col("g"), col("v"), p, "pv")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = df.groupBy(col("g"))
        .agg(expr(s"percentile(v, $p)").as("pv"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == want, s"p=$p")
    }
  }

  test("robustFlags: hand-computed median/MAD, milli-z and gate") {
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L), ("a", 5L, 100L))
      .toDF("g", "id", "v")
    // values 1,2,3,4,100: med=3, devs 2,1,0,1,97, mad=1
    val got = Outliers.robustFlags(df, col("id"), col("g"), col("v"), 2500L)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4),
          Option(r.get(5)).map(_.asInstanceOf[Long]), r.getBoolean(6)))).toMap
    assert(got(1L) == ((1.0, 3.0, 1.0, Some(2000L), false)))
    assert(got(2L) == ((2.0, 3.0, 1.0, Some(1000L), false)))
    assert(got(3L) == ((3.0, 3.0, 1.0, Some(0L), false)))
    assert(got(5L) == ((100.0, 3.0, 1.0, Some(97000L), true)))
  }

  test("robustFlags: a zero-MAD group flags nothing and yields null z") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L), ("a", 4L, 9L))
      .toDF("g", "id", "v")
    // med=5, devs 0,0,0,4 -> mad=0
    val got = Outliers.robustFlags(df, col("id"), col("g"), col("v"), 2500L)
      .collect()
    assert(got.forall(r => r.isNullAt(5)))
    assert(got.forall(!_.getBoolean(6)))
  }

  test("robustFlags: even-sized group interpolates the median") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 4L), ("a", 4L, 8L))
      .toDF("g", "id", "v")
    // sorted 1,2,4,8: med = 3.0; devs 2,1,1,5 -> sorted 1,1,2,5, mad = 1.5
    val got = Outliers.robustFlags(df, col("id"), col("g"), col("v"), 3000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4), r.get(5).asInstanceOf[Long]))).toMap
    assert(got(1L) == ((3.0, 1.5, 1333L)))
    assert(got(4L) == ((3.0, 1.5, 3333L)))
  }

  test("robustFlags is stable under repartitioning") {
    val df = Seq.tabulate(60)(i => ("g" + (i % 3), i.toLong, (i * 37 % 50).toLong))
      .toDF("g", "id", "v")
    val a = Outliers.robustFlags(df, col("id"), col("g"), col("v"), 2000L)
      .orderBy(col("id")).collect().toSeq
    val b = Outliers.robustFlags(df.repartition(7, col("v")),
        col("id"), col("g"), col("v"), 2000L)
      .orderBy(col("id")).collect().toSeq
    assert(a == b)
  }

  // -------------------------------------- Decontaminate.semanticHits

  private val deconAnchors = SemanticDedup.anchors(dim = 4, k = 8, seed = 7L)

  private def cellOfLocal(v: Seq[Double]): Int = {
    val dots = deconAnchors.map(a => a.zip(v).map { case (x, y) => x * y }.sum)
    dots.indexOf(dots.max)
  }

  private def cosLocal(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  test("semanticHits equals the exact same-cell pair scan") {
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(1.0, 0.1, 0.0, 0.0),
      2L -> Seq(0.9, 0.2, 0.05, 0.0),
      3L -> Seq(0.0, 1.0, 0.0, 0.2),
      4L -> Seq(0.0, 0.0, 1.0, 0.0),
      5L -> Seq(1.0, 0.1, 0.0, 0.01),
      6L -> Seq(0.05, 0.95, 0.0, 0.15),
      7L -> Seq(0.02, 0.98, 0.01, 0.18),
      8L -> Seq(-1.0, 0.0, 0.3, 0.0))
    val df = vecs.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val isEval = (id: Long) => id % 3 == 0
    val eval = df.filter(pmod(col("vec_id"), lit(3L)) === 0)
    val train = df.filter(pmod(col("vec_id"), lit(3L)) =!= 0)
    val thr = 0.8
    val got = Decontaminate.semanticHits(train, col("vec_id"), col("embedding"),
        eval, col("vec_id"), col("embedding"), thr, deconAnchors)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val want = vecs.filterNot(v => isEval(v._1)).flatMap { case (tid, tv) =>
      val hits = vecs.filter(v => isEval(v._1))
        .filter { case (_, ev) => cellOfLocal(ev) == cellOfLocal(tv) }
        .map { case (_, ev) => cosLocal(tv, ev) }
        .filter(_ >= thr)
      if (hits.isEmpty) None
      else Some(tid -> ((hits.size.toLong,
        BigDecimal(hits.max).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    }.toMap
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce at least one hit")
  }

  test("an identical vector in train and eval is flagged at cosine 1") {
    val df = Seq(
      (1L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),
      (3L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val eval = df.filter(col("vec_id") === 3L)
    val train = df.filter(col("vec_id") =!= 3L)
    val got = Decontaminate.semanticHits(train, col("vec_id"), col("embedding"),
        eval, col("vec_id"), col("embedding"), 0.99, deconAnchors)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 1L, 1.0)))
  }

  // ------------------------------------------------- BpeTrain.encode

  test("encode: hand-traced merges and per-word token counts") {
    // words: low(3), lower(1), lowest(1); merges: (l,o) then (lo,w)
    val df = Seq((1L, "low lower lowest low"), (2L, "low"))
      .toDF("doc_id", "text")
    val got = BpeTrain.encode(df, col("doc_id"), col("text"), 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // low -> [low] = 1, lower -> [low, e, r] = 3, lowest -> [low, e, s, t] = 4
    assert(got(1L) == ((4L, 1L + 3L + 4L + 1L)))
    assert(got(2L) == ((1L, 1L)))
  }

  test("encode: single-char words (below the training floor) count one token") {
    val df = Seq((1L, "a a bb a")).toDF("doc_id", "text")
    val got = BpeTrain.encode(df, col("doc_id"), col("text"), 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // bb merges (b,b) -> 1 token; each "a" is 1 token
    assert(got(1L) == ((4L, 4L)))
  }

  test("encode matches a sequential reference BPE") {
    def refBpe(corpus: Seq[String], n: Int): (Seq[(String, String)], Map[String, Seq[String]]) = {
      var vocab: Map[Seq[String], Long] = corpus
        .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.length >= 2)
        .groupBy(identity).map { case (w, ws) => w.map(_.toString) -> ws.size.toLong }
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (merges.size < n && !done) {
        val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, c) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            pairCounts((p(0), p(1))) = pairCounts.getOrElse((p(0), p(1)), 0L) + c
          }
        }
        if (pairCounts.isEmpty) done = true
        else {
          val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
          merges += best
          vocab = vocab.map { case (syms, c) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.size) {
              if (i + 1 < syms.size && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += syms(i) + syms(i + 1); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.toSeq -> c
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        }
      }
      (merges.toSeq, vocab.keys.map(s => s.mkString -> s).toMap)
    }
    val corpus = Seq(
      "the merge table scans fast rows", "the table scans the rows fast",
      "merge the fast table rows now", "scans merge rows the fast table")
    val (_, encoded) = refBpe(corpus, 5)
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = BpeTrain.encode(df, col("doc_id"), col("text"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = corpus.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.trim.toLowerCase.split("\\s+").map { w =>
        if (w.length < 2) 1L else encoded(w).size.toLong
      }.sum
    }.toMap
    assert(got == want)
  }

  // ------------------------------------------------- CharEntropyExpr

  private def centAll(rows: Seq[(Long, String)]) =
    rows.toDF("id", "t")
      .select(col("id"), graft.plans.CharEntropyExprOps.stats(col("t")).as("s"))
      .select(col("id"), col("s.n_chars"), col("s.n_distinct_chars"),
        col("s.entropy_micro"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("char entropy: hand-computed micro-nat sums") {
    val got = centAll(Seq(1L -> "aab", 2L -> "zzzz", 3L -> ""))
    // aab: p(a)=2/3, p(b)=1/3 -> floor terms 270310 + 366204 = 636514
    assert(got(1L) == ((3L, 2L, 636514L)))
    assert(got(2L) == ((4L, 1L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L)))
  }

  test("char entropy counts codepoints, not UTF-16 units") {
    val got = centAll(Seq(1L -> "😀😀a"))
    assert(got(1L)._1 == 3L)
    assert(got(1L)._2 == 2L)
  }

  test("char entropy equals the explode+count composition") {
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "aaaaabbbbbcccccddddd",
      3L -> "mixed CASE With  spaces\tand\nnewlines")
    val got = centAll(texts)
    texts.foreach { case (id, t) =>
      val cps = t.codePoints().toArray.toSeq
      val n = cps.size
      val want = cps.groupBy(identity).values.map { g =>
        val p = g.size.toDouble / n
        math.floor(-p * math.log(p) * 1e6).toLong
      }.sum
      assert(got(id) == ((n.toLong, cps.distinct.size.toLong, want)))
    }
  }

  test("char entropy is null on null input") {
    val r = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(graft.plans.CharEntropyExprOps.stats(col("t"))).head()
    assert(r.isNullAt(0))
  }

  // ---------------------------------- DupClusters.connectedComponentsStar

  test("star CC equals min-label propagation on a mixed clique graph") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // clique
      (10L, 11L), (11L, 10L),       // duplicate + reversed edges
      (20L, 21L), (21L, 22L),       // small chain
      (30L, 31L))
      .toDF("id_a", "id_b")
    val star = DupClusters.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val label = DupClusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == label)
    assert(star(3L) == 1L && star(22L) == 20L && star(31L) == 30L)
  }

  test("star CC closes a 300-node chain within the default round budget") {
    // min-label propagation needs ~300 rounds here (the diameter);
    // star contraction closes it in O(log n)
    val pairs = (0L until 299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val star = DupClusters.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(star.length == 300)
    assert(star.forall(_._2 == 0L))
  }

  test("star CC: self-loops ignored, every paired node labeled") {
    val pairs = Seq((5L, 5L), (6L, 7L)).toDF("id_a", "id_b")
    val star = DupClusters.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == Map(5L -> 5L, 6L -> 6L, 7L -> 6L))
  }

  // ------------------------------------------------ AnchorArgmaxExpr

  test("anchor-argmax kernel matches the composed array argmax incl. ties") {
    val anchors = SemanticDedup.anchors(dim = 8, k = 16, seed = 5L)
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 0.7 + d) * (1 + d * 0.1))))
    // float input (the embeddings column type) and double input
    val fdf = vecs.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "v")
    val kf = fdf.select(col("vec_id"),
        SemanticDedup.cellOf(col("v"), anchors).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cf = fdf.select(col("vec_id"),
        SemanticDedup.cellOfComposed(col("v"), anchors).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kf == cf)
    // a tie fixture: identical anchors 3 and 7 -> smallest index wins
    val dupAnchors = anchors.updated(7, anchors(3))
    val tdf = vecs.map { case (id, v) => (id, v) }.toDF("vec_id", "v")
    val kt = tdf.select(SemanticDedup.cellOf(col("v"), dupAnchors).as("c"))
      .collect().map(_.getInt(0))
    val ct = tdf.select(SemanticDedup.cellOfComposed(col("v"), dupAnchors).as("c"))
      .collect().map(_.getInt(0))
    assert(kt.toSeq == ct.toSeq)
    assert(!kt.contains(7), "ties must resolve to the smaller duplicate index")
  }

  test("anchor-argmax kernel is null on null input") {
    val anchors = SemanticDedup.anchors(dim = 4, k = 4, seed = 5L)
    val r = Seq(Tuple1(Option.empty[Seq[Double]])).toDF("v")
      .select(SemanticDedup.cellOf(col("v"), anchors)).head()
    assert(r.isNullAt(0))
  }

  // ---------------------------------------------- NgramLm.kneserNey

  test("kneser-ney: hand-computed probabilities on a tiny corpus") {
    // corpus "a b a b" + "a c": bigrams ab(2), ba(1), ac(1)
    // ctx(a)=3 fanout 2; ctx(b)=1 fanout 1; cont: b<-1, a<-1, c<-1; types=3
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val d = 0.75
    def pkn(c2: Double, ctx: Double, n1f: Double, n1b: Double, bt: Double) =
      (c2 - d) / ctx + d * n1f / ctx * (n1b / bt)
    val pab = pkn(2, 3, 2, 1, 3) // p(b|a)
    val pba = pkn(1, 1, 1, 1, 3) // p(a|b)
    val pac = pkn(1, 3, 2, 1, 3) // p(c|a)
    def lpMicro(p: Double) = math.floor(math.log(p) * 1e6)
    val got = NgramLm.kneserNeyScore(df, col("doc_id"), col("text"), d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc 1: bigrams ab, ba, ab
    val s1 = lpMicro(pab) + lpMicro(pba) + lpMicro(pab)
    assert(got(1L) == ((3L,
      BigDecimal(s1 / 3e6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    val s2 = lpMicro(pac)
    assert(got(2L) == ((1L,
      BigDecimal(s2 / 1e6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("kneser-ney probabilities sum to one per context") {
    // the discounted mass exactly funds the continuation back-off:
    // sum_w2 p(w2|w1) must be 1 for every observed context w1
    val corpus = Seq(
      "the fast table scans rows", "the table holds fast rows",
      "fast rows join the table", "table scans beat slow scans")
    val toks = corpus.flatMap(_.split(" "))
    val bigrams = corpus.flatMap(s => s.split(" ").sliding(2).map(a => (a(0), a(1))))
    val biC = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val ctx = biC.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> ((m.values.sum, m.size.toDouble)) }
    val cont = biC.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toDouble }
    val bt = biC.size.toDouble
    val d = 0.75
    val vocab2 = biC.keys.map(_._2).toSeq.distinct
    ctx.foreach { case (w1, (cw, n1f)) =>
      val total = vocab2.map { w2 =>
        val c2 = biC.getOrElse((w1, w2), 0.0)
        // unseen bigrams get only the back-off term
        (if (c2 > 0) (c2 - d) / cw else 0.0) + d * n1f / cw * (cont(w2) / bt)
      }.sum
      // full vocab coverage of continuations makes this exactly 1 when
      // every w2 in the continuation table is considered
      assert(math.abs(total - 1.0) < 1e-9, s"context $w1 sums to $total")
    }
  }

  test("kneser-ney: docs with fewer than two tokens score zero") {
    val df = Seq((1L, "single"), (2L, "a b a")).toDF("doc_id", "text")
    val got = NgramLm.kneserNeyScore(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((0L, 0.0)))
    assert(got(2L)._1 == 2L)
  }

  // ---------------------------------------------------- OphMinHash

  private def ophRef(shingles: Seq[String], k: Int): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val p = graft.plans.OphMinHashOps.P
    val bins = Array.fill(k)(Long.MaxValue)
    shingles.foreach { s =>
      val d = md.digest(s.getBytes("UTF-8"))
      var h = 0L
      (0 until 8).foreach(b => h = (h << 8) | (d(b) & 0xffL))
      h = (h >>> 4) % p
      val bin = (h % k).toInt
      if (h < bins(bin)) bins(bin) = h
    }
    (0 until k).map { i =>
      (0 until k).map(j => bins((i + j) % k)).find(_ != Long.MaxValue).getOrElse(p)
    }
  }

  private def ophSig(shingles: Seq[String], k: Int): Seq[Long] =
    Seq(Tuple1(shingles)).toDF("sh")
      .select(graft.plans.OphMinHashExpr.signature(col("sh"), k))
      .head().getSeq[Long](0)

  test("oph signature matches the sequential reference incl. densification") {
    val fixtures = Seq(
      Seq("a b c", "b c d", "c d e", "d e f", "x y z"),
      Seq("one two three"),
      Seq.tabulate(40)(i => s"sh $i gram"))
    fixtures.foreach { sh =>
      assert(ophSig(sh, 16) == ophRef(sh, 16), s"fixture $sh")
    }
  }

  test("oph signature: single shingle fills every bin by rotation") {
    val sig = ophSig(Seq("only shingle here"), 16)
    assert(sig.distinct.size == 1)
    assert(sig.head != graft.plans.OphMinHashOps.P)
  }

  test("oph signature: empty shingle set emits the p sentinel everywhere") {
    val sig = ophSig(Seq.empty[String], 8)
    assert(sig == Seq.fill(8)(graft.plans.OphMinHashOps.P))
  }

  test("oph near-dup pipeline recovers planted duplicates") {
    val base = Seq.tabulate(12)(i =>
      (i.toLong, s"alpha bravo charlie delta echo foxtrot golf hotel item$i extra words here"))
    val planted = Seq(
      (100L, base(0)._2 + " dup"),
      (101L, base(5)._2 + " dup"))
    val df = (base ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.ophMinHashLsh(df, col("doc_id"), col("text"),
        shingleK = 3, numBins = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((0L, 100L)))
    assert(ids.contains((5L, 101L)))
    assert(pairs.forall(_._3 >= 0.5))
  }

  // ----------------------------------------------------- BitextMining

  private def refMine(srcV: Seq[(Long, Seq[Double])], tgtV: Seq[(Long, Seq[Double])],
      k: Int, marginMilli: Long): Seq[(Long, Long, Long, Long)] = {
    def topk(qs: Seq[(Long, Seq[Double])], cs: Seq[(Long, Seq[Double])]) =
      qs.map { case (qid, qv) =>
        val ranked = cs.map { case (cid, cv) => (cid, cosLocal(cv, qv)) }
          .sortBy { case (cid, c) => (-c, cid) }.take(k)
          .map { case (cid, c) => (cid, math.floor(c * 1e6).toLong) }
        val sum = ranked.map(_._2).sum
        val best = ranked.minBy { case (cid, cm) => (-cm, cid) }
        qid -> ((sum, best))
      }.toMap
    val f = topk(srcV, tgtV)
    val b = topk(tgtV, srcV)
    srcV.flatMap { case (sid, _) =>
      val (sf, (tid, cm)) = f(sid)
      val (sb, (backSid, _)) = b(tid)
      if (backSid != sid || sf + sb <= 0) None
      else {
        val margin = math.floor(2000.0 * k * cm / (sf + sb)).toLong
        if (margin >= marginMilli) Some((sid, tid, cm, margin)) else None
      }
    }
  }

  private def mineDf(rows: Seq[(Long, Seq[Double])]) =
    rows.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("vec_id", "embedding")

  test("bitext mining matches the sequential reference on a mixed fixture") {
    val srcV: Seq[(Long, Seq[Double])] = Seq(
      0L -> Seq(1.0, 0.05, 0.0), 2L -> Seq(0.0, 1.0, 0.1),
      4L -> Seq(0.1, 0.1, 1.0), 6L -> Seq(0.9, 0.1, 0.1),
      8L -> Seq(0.5, 0.5, 0.0))
    val tgtV: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(0.95, 0.1, 0.0), 3L -> Seq(0.05, 0.95, 0.05),
      5L -> Seq(0.0, 0.2, 0.9), 7L -> Seq(0.6, 0.4, 0.1))
    val k = 2
    for (thr <- Seq(0L, 1050L)) {
      val got = BitextMining.minePairs(
          mineDf(srcV), col("vec_id"), col("embedding"),
          mineDf(tgtV), col("vec_id"), col("embedding"), k, thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val want = refMine(srcV, tgtV, k, thr).sortBy(_._1)
      assert(got == want, s"thr=$thr")
      assert(want.nonEmpty, s"fixture must mine at least one pair at thr=$thr")
    }
  }

  test("lsh-bucketed mining matches the bucket-restricted reference") {
    val dim = 4
    val nPlanes = 2
    val planes = Similarity.hyperplanes(dim, nPlanes, 42L)
    def bucketOf(v: Seq[Double]): Long =
      planes.zipWithIndex.map { case (p, i) =>
        if (p.zip(v).map { case (a, b) => a * b }.sum >= 0) 1L << i else 0L
      }.sum
    def refMineLsh(srcV: Seq[(Long, Seq[Double])], tgtV: Seq[(Long, Seq[Double])],
        k: Int, marginMilli: Long): Seq[(Long, Long, Long, Long)] = {
      val pairs = for {
        (sid, sv) <- srcV; (tid, tv) <- tgtV
        if bucketOf(sv) == bucketOf(tv)
      } yield (sid, tid, cosLocal(sv, tv))
      // quantize BEFORE ranking: the LSH variant runs entirely in
      // (micro-cos DESC, id ASC) order (the bounded-heap contract)
      def side(byKey: ((Long, Long, Double)) => Long,
          other: ((Long, Long, Double)) => Long) =
        pairs.groupBy(byKey).map { case (id, ps) =>
          val ranked = ps
            .map(p => (other(p), math.floor(p._3 * 1e6).toLong))
            .sortBy { case (o, cm) => (-cm, o) }.take(k)
          id -> ((ranked.map(_._2).sum, ranked.minBy { case (o, cm) => (-cm, o) }))
        }
      val f = side(_._1, _._2)
      val b = side(_._2, _._1)
      srcV.flatMap { case (sid, _) =>
        f.get(sid).flatMap { case (sf, (tid, cm)) =>
          val (sb, (backSid, _)) = b(tid)
          if (backSid != sid || sf + sb <= 0) None
          else {
            val margin = math.floor(2000.0 * k * cm / (sf + sb)).toLong
            if (margin >= marginMilli) Some((sid, tid, cm, margin)) else None
          }
        }
      }
    }
    val srcV: Seq[(Long, Seq[Double])] = Seq(
      0L -> Seq(1.0, 0.05, 0.0, 0.1), 2L -> Seq(0.0, 1.0, 0.1, -0.2),
      4L -> Seq(0.1, 0.1, 1.0, 0.3), 6L -> Seq(0.9, 0.1, 0.1, 0.0),
      8L -> Seq(-0.5, 0.5, 0.0, 0.4))
    val tgtV: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(0.95, 0.1, 0.0, 0.12), 3L -> Seq(0.05, 0.95, 0.05, -0.15),
      5L -> Seq(0.0, 0.2, 0.9, 0.25), 7L -> Seq(0.6, 0.4, 0.1, 0.05))
    for (thr <- Seq(0L, 1050L)) {
      val got = BitextMining.minePairsLsh(
          mineDf(srcV), col("vec_id"), col("embedding"),
          mineDf(tgtV), col("vec_id"), col("embedding"), 2, thr,
          dim = dim, nPlanes = nPlanes)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val want = refMineLsh(srcV, tgtV, 2, thr).sortBy(_._1)
      assert(got == want, s"thr=$thr")
    }
    assert(refMineLsh(srcV, tgtV, 2, 0L).nonEmpty,
      "fixture must mine at least one pair")
  }

  test("bitext mining: non-mutual best pairs are excluded") {
    // hub: both sources' best is tgt 1, but tgt 1's best is src 0 —
    // so (2, 1) must not be mined even though 1 is 2's best
    val srcV: Seq[(Long, Seq[Double])] = Seq(
      0L -> Seq(1.0, 0.0), 2L -> Seq(0.9, 0.44))
    val tgtV: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(1.0, 0.01), 3L -> Seq(0.0, 1.0))
    val got = BitextMining.minePairs(
        mineDf(srcV), col("vec_id"), col("embedding"),
        mineDf(tgtV), col("vec_id"), col("embedding"), 2, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)))
    assert(!got.exists(_._1 == 2L))
  }

  // --------------------------------------------------- ParagraphDedup

  private def pddAll(rows: Seq[(Long, String)]) =
    ParagraphDedup.dedup(rows.toDF("doc_id", "ptext"), col("doc_id"), col("ptext"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("paragraph dedup: global first occurrence wins, later copies drop") {
    val got = pddAll(Seq(
      1L -> "A\n\nB",
      2L -> "B\n\nC",
      3L -> "A\n\nC\n\nA"))
    assert(got(1L) == ((2L, 2L, "A\n\nB")))
    assert(got(2L) == ((2L, 1L, "C")))
    assert(got(3L) == ((3L, 0L, "")))
  }

  test("paragraph dedup: within-doc repeats keep only the first instance") {
    val got = pddAll(Seq(1L -> "X one\n\nY two\n\nX one"))
    assert(got(1L) == ((3L, 2L, "X one\n\nY two")))
  }

  test("paragraph dedup: empty paragraphs (separator runs) are dropped before counting") {
    val got = pddAll(Seq(1L -> "A\n\n\n\nB\n\n  \n\nC"))
    assert(got(1L) == ((3L, 3L, "A\n\nB\n\nC")))
  }

  test("paragraph dedup is stable under repartitioning") {
    val rows = Seq.tabulate(30)(i =>
      (i.toLong, s"shared para\n\nunique ${i % 7}\n\nalso shared"))
    val df = rows.toDF("doc_id", "ptext")
    val a = ParagraphDedup.dedup(df, col("doc_id"), col("ptext"))
      .orderBy(col("doc_id")).collect().toSeq
    val b = ParagraphDedup.dedup(df.repartition(5, col("ptext")),
        col("doc_id"), col("ptext"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(a == b)
  }

  test("semanticClean drops exactly the flagged rows") {
    val df = Seq(
      (1L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.1f, 0.0f, 1.0f)),
      (3L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),
      (4L, Seq(-0.7f, 0.0f, 0.7f, 0.0f)))
      .toDF("vec_id", "embedding")
    val eval = df.filter(col("vec_id") === 3L)
    val train = df.filter(col("vec_id") =!= 3L)
    val clean = Decontaminate.semanticClean(train, col("vec_id"), col("embedding"),
        eval, col("vec_id"), col("embedding"), 0.99, deconAnchors)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    assert(clean.toSeq == Seq(2L, 4L))
  }
}
