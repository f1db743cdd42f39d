package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the round-7 operators: leakage-safe cluster splits,
  * hard-negative mining, token-budget selection.
  */
class Round7OpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------------ Splits

  test("cluster split: near-dup documents always share a split") {
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two chains (1-2-3), (10-11) and a big standalone population
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Splits.clusterSplit(docs, col("doc_id"), pairs,
        Seq("train" -> 0.5, "valid" -> 0.25, "test" -> 0.25))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // chain members collapse to min-id cluster and one split
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L && got(3L)._1 == 1L)
    assert(Set(got(1L)._2, got(2L)._2, got(3L)._2).size == 1)
    assert(got(10L)._1 == 10L && got(11L)._1 == 10L)
    assert(got(10L)._2 == got(11L)._2)
    // singletons keep their own id as cluster
    assert(got(20L)._1 == 20L)
    // every doc is assigned a valid label; all rows present
    assert(got.size == 40)
    assert(got.values.forall(v => Set("train", "valid", "test")(v._2)))
  }

  test("cluster split: singleton assignment equals the per-doc C19 split of the same key") {
    val docs = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val viaCluster = Splits.clusterSplit(docs, col("doc_id"), noPairs, splits)
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val direct = docs.select(col("doc_id"),
        Sampling.assignSplit(col("doc_id").cast("string"), splits).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaCluster == direct)
  }

  test("cluster split: growth-stable — adding new docs never moves old clusters") {
    val docs = (1L to 50L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val grown = (1L to 80L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val splits = Seq("train" -> 0.7, "test" -> 0.3)
    val before = Splits.clusterSplit(docs, col("doc_id"), pairs, splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val after = Splits.clusterSplit(grown, col("doc_id"), pairs, splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(before.forall { case (k, v) => after(k) == v })
  }

  // ------------------------------------------------------ HardNegatives

  test("hard negatives: positives excluded, ranks contiguous, equals brute-force minus qrels") {
    val dim = 8
    def vec(seed: Long): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    val corpus = (10L to 60L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val queries = Seq((0L, vec(1000L)), (1L, vec(2000L)))
      .toDF("query_id", "qv")
    val qrels = Seq((0L, 12L), (0L, 13L), (1L, 20L)).toDF("query_id", "doc_id")
    val k = 10
    val n = 5
    val got = HardNegatives.mine(corpus, col("vec_id"), col("embedding"),
        queries, qrels, k, n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    // no positive survives
    val qrelSet = Set((0L, 12L), (0L, 13L), (1L, 20L))
    assert(got.forall { case (q, d, _, _) => !qrelSet((q, d)) })
    // exactly n per query, ranks 1..n
    for (q <- Seq(0L, 1L)) {
      val ranks = got.filter(_._1 == q).map(_._4).sorted
      assert(ranks.toSeq == (1L to n.toLong))
    }
    // equals the reference: per-query brute-force order minus positives
    val ref = Similarity.bruteForceTopKBatch(corpus, col("vec_id"), col("embedding"), queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filterNot { case (q, d, _) => qrelSet((q, d)) }
      .groupBy(_._1)
      .values.flatMap { rows =>
        rows.sortBy { case (_, d, s) => (-s, d) }.take(n).toSeq
      }.toSet
    assert(got.map { case (q, d, s, _) => (q, d, s) }.toSet == ref)
  }

  test("hard negatives: a query whose whole neighborhood is positive yields no rows") {
    val corpus = Seq((10L, Seq(1f, 0f)), (11L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val queries = Seq((0L, Seq(1f, 0f))).toDF("query_id", "qv")
    val qrels = Seq((0L, 10L), (0L, 11L)).toDF("query_id", "doc_id")
    val got = HardNegatives.mine(corpus, col("vec_id"), col("embedding"),
      queries, qrels, k = 5, nNeg = 3)
    assert(got.count() == 0)
  }

  // ---------------------------------------------------------- Selection

  test("token budget: matches the sequential greedy fill exactly") {
    val r = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, r.nextInt(2000).toLong - 1000L, 10L + r.nextInt(90)))
    val df = rows.toDF("doc_id", "score", "n_toks")
    val budget = 8000L
    val got = Selection.tokenBudget(df, col("doc_id"), col("score"), col("n_toks"), budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

    // sequential reference: sort (score desc, id), keep while cum < budget
    var cum = 0L
    val ref = rows.sortBy { case (id, s, _) => (-s, id) }.flatMap { case (id, s, t) =>
      val keep = cum < budget
      val before = cum
      cum += t
      if (keep) Some((id, s, t, before)) else None
    }.sortBy(_._1)
    assert(got.toSeq == ref)
  }

  test("token budget: partitioning-independent and exact on ties") {
    val df = (1L to 300L).map(i => (i, i % 7, 25L)).toDF("doc_id", "score", "n_toks")
    val a = Selection.tokenBudget(df, col("doc_id"), col("score"), col("n_toks"), 1000L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Selection.tokenBudget(df.repartition(13), col("doc_id"), col("score"), col("n_toks"), 1000L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
    // ties on score fall back to ascending id: 1000/25 = 40 docs, all score 6 first
    val kept = Selection.tokenBudget(df, col("doc_id"), col("score"), col("n_toks"), 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.length == 40)
    assert(kept.forall(_._2 == 6L)) // 300/7 -> 42 docs with score 6; first 40 by id win
  }

  test("token budget: zero budget keeps nothing; huge budget keeps everything") {
    val df = Seq((1L, 5L, 10L), (2L, 4L, 10L)).toDF("doc_id", "score", "n_toks")
    assert(Selection.tokenBudget(df, col("doc_id"), col("score"), col("n_toks"), 0L).count() == 0)
    assert(Selection.tokenBudget(df, col("doc_id"), col("score"), col("n_toks"), 1000L).count() == 2)
  }

  test("token budget: no single-partition global window in the plan") {
    val df = (1L to 100L).map(i => (i, i, 10L)).toDF("doc_id", "score", "n_toks")
    val plan = Selection.tokenBudget(df, col("doc_id"), col("score"), col("n_toks"), 500L)
      .queryExecution.executedPlan.toString
    // the per-row running sum must be partitioned by the coarse range
    // key; only the tiny per-range offset window may be global
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.exists(_.contains("coarse")),
      s"expected a coarse-partitioned window, got:\n$plan")
  }

  // ----------------------------------------------------- Decontaminate

  test("decontaminate: removes exactly the eval-overlapping docs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),     // shares "alpha beta gamma" with eval
      (2L, "epsilon zeta eta theta"),     // clean
      (3L, "iota kappa lambda mu"),       // clean
      (4L, "nu xi alpha beta gamma"),     // shares the eval shingle too
      (5L, "omicron pi rho sigma")        // clean
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = Decontaminate.cleanDocs(corpus, col("doc_id"), col("text"),
        eval, col("text"), shingleK = 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L, 5L))
  }

  test("decontaminate: bloom false positives never change the result") {
    // a deliberately saturated filter (64 bits, 1 hash, ~200 distinct
    // shingles -> nearly every probe is a false positive) must still
    // yield the exact answer: FPs only cost confirm-join work
    val corpus = (1L to 50L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d")).toDF("doc_id", "text")
    val eval = Seq((999L, "w7a w7b w7c w7d")).toDF("doc_id", "text")
    val exact = Decontaminate.cleanDocs(corpus, col("doc_id"), col("text"),
        eval, col("text"), shingleK = 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val saturated = Decontaminate.cleanDocs(corpus, col("doc_id"), col("text"),
        eval, col("text"), shingleK = 3, bloomBits = 64, bloomHashes = 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(exact == saturated)
    assert(!exact.contains(7L) && exact.size == 49)
  }

  test("decontaminate: all corpus columns survive; empty eval keeps everything") {
    val corpus = Seq((1L, "a b c", 5), (2L, "d e f", 6)).toDF("doc_id", "text", "meta")
    val eval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = Decontaminate.cleanDocs(corpus, col("doc_id"), col("text"),
        eval, col("text"), shingleK = 3)
    assert(got.columns.toSeq == Seq("doc_id", "text", "meta"))
    assert(got.count() == 2)
  }

  test("decontaminate: the bloom probe sits in the plan before the confirm join") {
    val corpus = (1L to 20L).map(i => (i, s"x$i y$i z$i")).toDF("doc_id", "text")
    val eval = Seq((99L, "x3 y3 z3")).toDF("doc_id", "text")
    val plan = Decontaminate.cleanDocs(corpus, col("doc_id"), col("text"),
        eval, col("text"), shingleK = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"),
      s"expected the bloom prefilter in the physical plan:\n$plan")
    // probe-then-confirm: the exact LeftSemi must be the PARENT of the
    // bloom Filter (prints above it), never pushed beneath — and the
    // scalar-subquery construction must leave no Cross join behind
    val lines = plan.linesIterator.toSeq
    val semiAt = lines.indexWhere(l => l.contains("LeftSemi"))
    val bloomAt = lines.indexWhere(l => l.contains("graft_bloom_contains"))
    assert(semiAt >= 0 && bloomAt > semiAt,
      s"confirm semi-join must sit above the bloom probe:\n$plan")
    assert(!plan.contains("Cross"), s"no cross join expected:\n$plan")
  }

  // ------------------------------------------------- SystematicSampling

  /** Sequential reference: hash order from the same kernel, then a
    * literal walk dropping ticks at odd multiples of total/(2k).
    */
  private def ppsReference(rows: Seq[(Long, Long)], k: Long): Seq[(Long, Long, Long, Long)] = {
    val hkeys = rows.map(_._1).toDF("doc_id")
      .select(col("doc_id"), Dedup.md5Hash60(col("doc_id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ordered = rows.sortBy { case (id, _) => (hkeys(id), id) }
    val total = rows.map(_._2).sum
    var cum = 0L
    ordered.flatMap { case (id, w) =>
      val before = cum
      cum += w
      // ticks are (2m+1)*total/(2k) for m in [0,k): count those in [before, before+w)
      val nSel = (0L until k).count { m =>
        val num = BigInt(2 * m + 1) * total
        num >= BigInt(2) * k * before && num < BigInt(2) * k * cum
      }.toLong
      if (nSel > 0) Some((id, w, before, nSel)) else None
    }.sortBy(_._1)
  }

  test("systematic PPS: matches the sequential tick walk exactly and sums to k") {
    val r = new scala.util.Random(11)
    val rows = (1L to 400L).map(i => (i, 1L + r.nextInt(200).toLong))
    val k = 37L
    val got = SystematicSampling.sample(rows.toDF("doc_id", "w"),
        col("doc_id"), col("w"), k)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == ppsReference(rows, k))
    assert(got.map(_._4).sum == k)
  }

  test("systematic PPS: an oversized unit is always selected; zero weights never are") {
    val rows = Seq((1L, 5000L)) ++ (2L to 60L).map(i => (i, 10L)) ++ Seq((99L, 0L))
    val got = SystematicSampling.sample(rows.toDF("doc_id", "w"),
        col("doc_id"), col("w"), 8L)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    // doc 1 holds 5000 of 5590 total; step = total/8 = ~699 -> many ticks
    assert(got(1L) >= 5L)
    assert(!got.contains(99L))
    assert(got.values.sum == 8L)
  }

  test("systematic PPS: partitioning-independent; no global data window in the plan") {
    val rows = (1L to 300L).map(i => (i, 1L + i % 50))
    val df = rows.toDF("doc_id", "w")
    val a = SystematicSampling.sample(df, col("doc_id"), col("w"), 20L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = SystematicSampling.sample(df.repartition(13), col("doc_id"), col("w"), 20L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
    val plan = SystematicSampling.sample(df, col("doc_id"), col("w"), 20L)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("Window") && l.contains("coarse")),
      s"expected a coarse-partitioned window:\n$plan")
  }

  // ------------------------------------------------------- EpochShuffle

  test("epoch shuffle: positions are a permutation; shards contiguous and near-equal") {
    val docs = (1L to 103L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = EpochShuffle.shuffle(docs, col("doc_id"), Seq(0, 1), nShards = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(got.length == 206)
    for (e <- Seq(0, 1)) {
      val ep = got.filter(_._1 == e).sortBy(_._3)
      // positions 0..n-1 exactly once
      assert(ep.map(_._3).toSeq == (0L until 103L))
      // shards partition the position range contiguously, sizes differ <= 1
      val sizes = ep.groupBy(_._4).map { case (s, rs) =>
        val ps = rs.map(_._3)
        // contiguous block
        assert(ps.max - ps.min + 1 == ps.length, s"shard $s not contiguous")
        // pos_in_shard is 0-based within the block
        assert(rs.map(_._5).sorted.toSeq == (0L until ps.length.toLong))
        s -> ps.length
      }
      assert(sizes.keySet == Set(0, 1, 2, 3))
      assert(sizes.values.max - sizes.values.min <= 1)
      // shard order follows position order
      assert(ep.map(_._4).toSeq == ep.map(_._4).sorted.toSeq)
    }
    // the two epochs draw different orders
    val o0 = got.filter(_._1 == 0).sortBy(_._3).map(_._2).toSeq
    val o1 = got.filter(_._1 == 1).sortBy(_._3).map(_._2).toSeq
    assert(o0 != o1 && o0.toSet == o1.toSet)
  }

  test("epoch shuffle: deterministic under repartitioning; no whole-epoch window") {
    val docs = (1L to 80L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = EpochShuffle.shuffle(docs, col("doc_id"), Seq(3), 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = EpochShuffle.shuffle(docs.repartition(7), col("doc_id"), Seq(3), 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
    val plan = EpochShuffle.shuffle(docs, col("doc_id"), Seq(3), 2)
      .queryExecution.executedPlan.toString
    // ranks must be computed per (epoch, coarse), never per epoch alone
    val rankWindows = plan.linesIterator.filter(l =>
      l.contains("row_number") && l.contains("windowspecdefinition")).toSeq
    assert(rankWindows.nonEmpty && rankWindows.forall(_.contains("coarse")),
      s"expected the rank window partitioned by (epoch, coarse):\n$plan")
  }

  // ------------------------------------------------------------ Novelty

  test("novelty: exact counts on a shared-shingle fixture") {
    val docs = Seq(
      (1L, "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "a b c x"),   // shingles: "a b c", "b c x"
      (3L, "p q r s"),   // both unique
      (4L, "m n o p"),   // exact duplicate pair with 5
      (5L, "m n o p")
    ).toDF("doc_id", "text")
    val got = Novelty.score(docs, col("doc_id"), col("text"), shingleK = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 2L, 1.0)))
    assert(got(4L) == ((2L, 0L, 0.0)))
    assert(got(5L) == ((2L, 0L, 0.0)))
  }

  test("novelty: short docs collapse to one whole-text shingle") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "solo")).toDF("doc_id", "text")
    val got = Novelty.score(docs, col("doc_id"), col("text"), shingleK = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1L, 0L, 0.0)) && got(2L) == ((1L, 0L, 0.0)))
    assert(got(3L) == ((1L, 1L, 1.0)))
  }
}
