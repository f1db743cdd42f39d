package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the hashed linear quality classifier and the per-source
  * drift statistics.
  */
class QualityStatsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  private def weightMilli(term: String): Long = {
    val bucket = hash60(term) % QualityClassifier.Buckets
    hash60("qw:" + bucket) % 2001L - 1000L
  }

  // -------------------------------------------------- QualityClassifier

  test("quality score matches the hand-computed hashed-feature sum") {
    val docs = Seq((1L, "good clean prose"), (2L, "a"), (3L, "x y")).toDF("doc_id", "text")
    val got = QualityClassifier.score(docs, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap

    def expected(terms: Seq[String]): (Long, Long, Double, Boolean) = {
      val logit = terms.map(weightMilli).sum
      val score = BigDecimal(logit.toDouble / (terms.size * 1000.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (terms.size.toLong, logit, score, logit > 0)
    }

    assert(got(1L) == expected(Seq("good", "clean", "prose", "good clean", "clean prose")))
    assert(got(2L) == expected(Seq("a")))
    assert(got(3L) == expected(Seq("x", "y", "x y")))
  }

  test("quality kernel matches the composed explode+agg path on real documents") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val kernel = QualityClassifier.score(docs, col("doc_id"), col("text"))
      .collect().map(_.toSeq).toSet
    val composed = QualityClassifier.scoreComposed(docs, col("doc_id"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(kernel == composed && kernel.nonEmpty)

    // edge strings: empty, single token, repeated whitespace, unicode,
    // trailing newline (Java trim would strip it, Spark trim must not),
    // tabs, and NULL text (kernel null-out must coalesce like the
    // composed left join)
    val edge = Seq((1L, ""), (2L, "one"), (3L, "  a   b  "), (4L, "héllo wörld héllo"),
        (5L, "foo bar\n"), (6L, "\tlead tab"), (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(QualityClassifier.score(edge, col("doc_id"), col("text"))
      .collect().map(_.toSeq).toSet ==
      QualityClassifier.scoreComposed(edge, col("doc_id"), col("text"))
        .collect().map(_.toSeq).toSet)

    // kernel path is a pure narrow map: zero Exchange in the plan
    val plan = QualityClassifier.score(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected zero-shuffle plan:\n$plan")
  }

  test("quality score is case/whitespace-normalized and repartition-stable") {
    val a = Seq((1L, "Alpha  Beta gamma"), (2L, "q r s")).toDF("doc_id", "text")
    val b = Seq((1L, "alpha beta gamma"), (2L, "q r s")).toDF("doc_id", "text")
    val ra = QualityClassifier.score(a, col("doc_id"), col("text")).collect().map(_.toSeq).toSet
    val rb = QualityClassifier.score(b.repartition(5), col("doc_id"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(ra == rb)
  }

  // --------------------------------------------------------- CorpusStats

  test("source drift matches hand-computed entropy and KL") {
    // s1: "a a b" (a=2, b=1, T=3); s2: "a c" (a=1, c=1, T=2).
    // corpus: a=3, b=1, c=1, T=5.
    val docs = Seq(("s1", "a a b"), ("s2", "a c")).toDF("source", "text")
    val got = CorpusStats.sourceDrift(docs, col("source"), col("text"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap

    def micro(x: Double): Long = math.floor(x * 1e6).toLong
    def r4(sumMicro: Long): Double =
      BigDecimal(sumMicro.toDouble / 1e6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    val s1Ent = micro(-(2.0 / 3) * math.log(2.0 / 3)) + micro(-(1.0 / 3) * math.log(1.0 / 3))
    val s1Kl = micro((2.0 / 3) * math.log((2.0 / 3) / (3.0 / 5))) +
      micro((1.0 / 3) * math.log((1.0 / 3) / (1.0 / 5)))
    val s2Ent = micro(-(1.0 / 2) * math.log(1.0 / 2)) * 2
    val s2Kl = micro((1.0 / 2) * math.log((1.0 / 2) / (3.0 / 5))) +
      micro((1.0 / 2) * math.log((1.0 / 2) / (1.0 / 5)))

    assert(got("s1") == ((2L, 3L, r4(s1Ent), r4(s1Kl))))
    assert(got("s2") == ((2L, 2L, r4(s2Ent), r4(s2Kl))))
  }

  test("source drift: a single source has zero KL and gibbs-inequality keeps KL >= 0") {
    val one = Seq(("only", "a b c a")).toDF("source", "text")
    val r1 = CorpusStats.sourceDrift(one, col("source"), col("text")).collect()
    assert(r1.length == 1 && r1(0).getDouble(4) == 0.0)

    val many = (1 to 40).map(i => (s"s${i % 4}", s"w${i % 7} w${i % 5} w${i % 3}"))
      .toDF("source", "text")
    val kls = CorpusStats.sourceDrift(many, col("source"), col("text"))
      .collect().map(_.getDouble(4))
    // quantization floors each term, so allow the micro-nat epsilon
    assert(kls.forall(_ >= -1e-4))
  }

  // ------------------------------------------------------------ PageRank

  test("integer pagerank matches the hand-iterated fixed-point values") {
    // edges: 1->2, 1->3, 2->1. outdeg: 1:2, 2:1; node 3 dangles.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    val U = PageRank.Unit
    val tp = U - 850L * U / 1000L

    // iter1: in(1)=U; in(2)=in(3)=U/2
    val r1_1 = tp + 850L * U / 1000L
    val r1_23 = tp + 850L * (U / 2) / 1000L
    // iter2: in(1)=r1(2); in(2)=in(3)=r1(1)/2
    val r2_1 = tp + 850L * r1_23 / 1000L
    val r2_23 = tp + 850L * (r1_1 / 2) / 1000L
    // iter3
    val r3_1 = tp + 850L * r2_23 / 1000L
    val r3_23 = tp + 850L * (r2_1 / 2) / 1000L

    val got = PageRank.ranks(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> r3_1, 2L -> r3_23, 3L -> r3_23))
  }

  test("pagerank: a sink hub outranks its spokes, and results are repartition-stable") {
    // star: every spoke points to hub 100 and back
    val spokes = (1L to 20L)
    val edges = (spokes.map(s => (s, 100L)) ++ spokes.map(s => (100L, s))).toDF("src", "dst")
    val ranks = PageRank.ranks(edges, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spokes.forall(s => ranks(100L) > ranks(s)))

    val re = PageRank.ranks(edges.repartition(7, col("dst")), iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == ranks)
  }
}
