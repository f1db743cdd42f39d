package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized law checks for the round-6 operators, against naive
  * in-memory references. Deterministic seeds — failures reproduce.
  */
class Round6PropertySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  // --- URL canonicalization laws ------------------------------------

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp")
    host <- Gen.oneOf("A.com", "b.Example.org", "C-d.net")
    path <- Gen.oneOf("", "/x", "/X/y", "/p&q", "/deep/")
    query <- Gen.oneOf("", "?utm_a=1", "?page=2", "?utm_a=1&page=2",
      "?page=2&utm_b=3", "?utm_a=1&utm_b=2", "?a=1&utm_x=9&b=2")
    frag <- Gen.oneOf("", "#f", "#utm_x")
    malformed <- Gen.oneOf(true, false)
    raw <- Gen.oneOf("/rel/path", "mailto:x@y", "no scheme here")
  } yield if (malformed) raw else s"$scheme://$host$path$query$frag"

  test("canonicalizeUrl is idempotent and never emits utm params or fragments") {
    val urls = (1L to 60L).map(seed => sample(urlGen, seed)).distinct
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
    val df = urls.toDF("id", "url")
    val once = df.select(col("id"), DomainCuration.canonicalizeUrl(col("url")).as("c"))
    val twice = once.select(col("id"), DomainCuration.canonicalizeUrl(col("c")).as("c2"))
    val c1 = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val c2 = twice.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    urls.foreach { case (id, raw) =>
      assert(c1(id) == c2(id), s"not idempotent for '$raw': '${c1(id)}' -> '${c2(id)}'")
      assert(!c1(id).contains("#"), s"fragment survived in '${c1(id)}'")
      assert(!c1(id).matches(".*[?&]utm_.*"), s"utm survived in '${c1(id)}'")
      assert(!c1(id).endsWith("?") && !c1(id).endsWith("/"), s"dangling tail in '${c1(id)}'")
    }
  }

  // --- CMS laws ------------------------------------------------------

  test("cms never undercounts on random streams; merge order never changes bytes") {
    val itemGen = Gen.frequency((5, Gen.const("hot")), (3, Gen.oneOf("w1", "w2", "w3")),
      (2, Gen.choose(0, 50).map(i => s"tail$i")))
    for (seed <- 1L to 5L) {
      val items = (0 until 400).map(i => sample(itemGen, seed * 1000 + i))
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val df = items.map(Tuple1(_)).toDF("x")
      val bytesA = df.repartition(7).select(graft.plans.CmsSketch.sketch(col("x")))
        .first().getAs[Array[Byte]](0)
      val bytesB = df.repartition(2).select(graft.plans.CmsSketch.sketch(col("x")))
        .first().getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(bytesA, bytesB), "partitioning changed sketch bytes")
      val buf = graft.plans.CmsSketch.deserialize(bytesA)
      truth.foreach { case (item, n) =>
        val est = graft.plans.CmsSketch.query(buf, item)
        assert(est >= n, s"undercount for $item: $est < $n (seed $seed)")
      }
    }
  }

  // --- importance weight laws ----------------------------------------

  test("importance weights: swapping target and raw roles negates bucket-disjoint rankings") {
    // target-heavy tokens must rank above raw-heavy tokens, and the
    // ordering inverts when the target flag inverts
    val docs = (1L to 30L).map { i =>
      val t = i % 3 == 0
      (i, if (t) "ttok ttok shared" else "rtok rtok shared", t)
    }
    val df = docs.toDF("doc_id", "text", "is_t")
    def weightsOf(flag: org.apache.spark.sql.Column) =
      ImportanceWeights.weights(df, col("doc_id"), col("text"), flag)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fwd = weightsOf(col("is_t"))
    val rev = weightsOf(!col("is_t"))
    docs.foreach { case (id, _, t) =>
      if (t) assert(fwd(id) > rev(id), s"doc $id should flip down when roles swap")
      else assert(fwd(id) < rev(id), s"doc $id should flip up when roles swap")
    }
  }

  // --- prefix dedup vs naive -------------------------------------------

  test("prefix groups agree with a naive in-memory grouping on random docs") {
    val tokGen = Gen.oneOf("a", "b", "c", "d")
    for (seed <- 1L to 5L) {
      val docs = (1L to 40L).map { i =>
        val len = 3 + (sample(Gen.choose(0, 5), seed * 100 + i): Int)
        val toks = (0 until len).map(j => sample(tokGen, seed * 1000 + i * 10 + j))
        (i, toks.mkString(" "))
      }
      val k = 3
      val got = Dedup.prefixGroups(docs.toDF("doc_id", "text"), col("doc_id"), col("text"), k)
        .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
      val expect = docs.groupBy(_._2.split("\\s+").take(k).mkString(" "))
        .values.filter(_.size > 1)
        .map(g => (g.size.toLong, g.map(_._1).min)).toSeq.sorted
      assert(got == expect, s"seed $seed")
    }
  }

  // --- semantic cell assignment vs naive -------------------------------

  test("cellOf matches a driver-side argmax on random vectors across anchor counts") {
    val vecGen = Gen.listOfN(8, Gen.choose(-100, 100).map(_ / 10.0f))
    for (k <- Seq(2, 5, 16)) {
      val anchors = SemanticDedup.anchors(dim = 8, k = k, seed = 31L)
      val vecs = (1L to 30L).map(i => (i, sample(vecGen, i * 7 + k).toSeq))
      val got = vecs.toDF("vec_id", "embedding")
        .select(col("vec_id"), SemanticDedup.cellOf(col("embedding"), anchors).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      vecs.foreach { case (id, v) =>
        val dots = anchors.map(a => v.zip(a).map { case (x, y) => x.toDouble * y }.sum)
        assert(got(id) == dots.indexOf(dots.max), s"vec $id, k=$k")
      }
    }
  }
}
