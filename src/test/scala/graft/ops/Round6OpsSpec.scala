package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the round-6 operators: domain curation, DSIR importance
  * weighting, semantic (anchor-cell) dedup.
  */
class Round6OpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ----------------------------------------------------- DomainCuration

  test("domain host extraction: scheme stripped, path dropped, no-match empty") {
    val df = Seq(
      (1L, "https://a.example.com/x/y"),
      (2L, "http://b.org"),
      (3L, "ftp://c.net/file"),
      (4L, "not a url"),
      (5L, "HTTPS://Upper.Scheme.com/x")
    ).toDF("doc_id", "url")
    val got = df.select(col("doc_id"), DomainCuration.host(col("url")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a.example.com", 2L -> "b.org", 3L -> "c.net",
      4L -> "", 5L -> "Upper.Scheme.com"))
  }

  test("domain stats: hand-counted docs/chars per host") {
    val df = Seq(
      (1L, "https://a.com/1", 10L),
      (2L, "https://a.com/2", 20L),
      (3L, "https://b.com/1", 5L)
    ).toDF("doc_id", "url", "n_chars")
    val got = DomainCuration.domainStats(df, col("url"), col("doc_id"), col("n_chars"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map("a.com" -> ((2L, 30L, 1L)), "b.com" -> ((1L, 5L, 3L))))
  }

  test("domain cap: at most maxDocs kept per domain, deterministic, small domains intact") {
    val df = (1L to 20L).map(i => (i, s"https://big.com/$i")).toDF("doc_id", "url")
      .union(Seq((100L, "https://small.com/1")).toDF("doc_id", "url"))
    val got = DomainCuration.capPerDomain(df, col("url"), col("doc_id"), maxDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.count(_._1 == "big.com") == 3)
    assert(got.count(_._1 == "small.com") == 1)
    // hash-ranked keep set is partitioning-independent
    val got2 = DomainCuration.capPerDomain(df.repartition(7), col("url"), col("doc_id"), maxDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet == got2.toSet)
  }

  test("url canonicalization: case, fragments, utm params, trailing slashes") {
    val df = Seq(
      (1L, "HTTPS://Ex.COM/Path/?utm_source=x&utm_campaign=y#frag"),
      (2L, "https://ex.com/Path"),
      (3L, "http://a.com/p?utm_medium=m&page=2"),
      (4L, "http://a.com/p?page=2&utm_medium=m"),
      (5L, "http://b.com/CaseKept/q?x=1")
    ).toDF("doc_id", "url")
    val got = df.select(col("doc_id"), DomainCuration.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "https://ex.com/Path", "scheme+host lowered, path case kept, utm+frag+slash stripped")
    assert(got(1L) == got(2L), "messy and clean forms collide")
    assert(got(3L) == "http://a.com/p?page=2", "leading utm stripped, kept param re-anchored")
    assert(got(4L) == "http://a.com/p?page=2", "utm stripped mid-query")
    assert(got(5L) == "http://b.com/CaseKept/q?x=1", "non-tracking query kept")
  }

  test("url canonicalization: path ampersands, malformed urls, sandwiched utm") {
    val df = Seq(
      (1L, "http://a.com/a&b"),                 // '&' in a query-less path
      (2L, "http://a.com/a?b"),                 // genuinely different url
      (3L, "/relative/path"),                   // no scheme -> pass through
      (4L, "mailto:x@y.com"),                   // no scheme://host shape
      (5L, "http://c.com/p?a=1&utm_x=2&b=3")    // utm between kept params
    ).toDF("doc_id", "url")
    val got = df.select(col("doc_id"), DomainCuration.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "http://a.com/a&b", "path & untouched")
    assert(got(1L) != got(2L), "distinct urls stay distinct")
    assert(got(3L) == "/relative/path" && got(4L) == "mailto:x@y.com",
      "non-matching urls pass through instead of collapsing")
    assert(got(5L) == "http://c.com/p?a=1&b=3", "utm dropped wherever it sits")
  }

  test("native vector kernels return null on length-mismatched inputs") {
    import graft.functions.VectorFunctions
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("dot"),
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("cos"),
      VectorFunctions.dotProductHof(col("a"), col("b")).as("hof")).first()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      "truncating to the shorter array would silently score malformed vectors")
  }

  test("prefix dedup: shared first-k tokens grouped, distinct prefixes not") {
    val df = Seq(
      (1L, "the quick brown fox jumps over a lazy dog end one"),
      (2L, "The quick BROWN fox jumps over a different ending here two"),
      (3L, "completely unrelated text with other words in it all three")
    ).toDF("doc_id", "text")
    val got = Dedup.prefixGroups(df, col("doc_id"), col("text"), k = 7)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 1L)), "docs 1+2 share the 7-token prefix, keep min id")
  }

  // --------------------------------------------------- ImportanceWeights

  test("importance weights: target-exclusive tokens score positive, raw-exclusive negative") {
    // target docs are all "aa", non-target all "bb": a doc of aa-tokens
    // must weigh more than a doc of bb-tokens, with exact token counts
    val df = Seq(
      (1L, "aa aa aa", true),
      (2L, "aa aa aa", true),
      (3L, "bb bb bb", false),
      (4L, "bb bb bb", false),
      (5L, "bb bb bb", false)
    ).toDF("doc_id", "text", "is_t")
    val got = ImportanceWeights.weights(df, col("doc_id"), col("text"), col("is_t"),
        buckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got(1L)._1 == 3L && got(3L)._1 == 3L, "token counts")
    assert(got(1L) == got(2L), "identical docs weigh identically")
    assert(got(1L)._2 > 0L, s"target-like doc should be positive: ${got(1L)._2}")
    assert(got(3L)._2 < 0L, s"raw-only doc should be negative: ${got(3L)._2}")
    // exact arithmetic for the aa bucket: tc=6, rc=6, tt=6, rt=15, B=64
    // lr = ln( (7*(15+64)) / (7*(6+64)) ) = ln(79/70); weight = 3 * floor(1e6*lr)
    val lr = math.floor(math.log((7.0 * 79.0) / (7.0 * 70.0)) * 1e6).toLong
    assert(got(1L)._2 == 3L * lr, s"expected ${3L * lr}, got ${got(1L)._2}")
  }

  test("importance weights: partitioning-independent") {
    val df = (1L to 50L).map(i => (i, s"tok${i % 7} tok${i % 3} tok${i % 11}", i % 4 == 0))
      .toDF("doc_id", "text", "is_t")
    val a = ImportanceWeights.weights(df, col("doc_id"), col("text"), col("is_t"))
      .orderBy("doc_id").collect().toSeq
    val b = ImportanceWeights.weights(df.repartition(9), col("doc_id"), col("text"), col("is_t"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  // ------------------------------------------------------ DotProductExpr

  test("native dot product kernel is bit-identical to the HOF composition") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(q).select(
        graft.functions.VectorFunctions.dotProduct(col("embedding"), col("qv")).as("native"),
        graft.functions.VectorFunctions.dotProductHof(col("embedding"), col("qv")).as("hof"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(both.nonEmpty)
  }

  // ------------------------------------------------------ SemanticDedup

  test("semantic dedup: argmax cell matches driver-side dot products, ties to smallest") {
    val anchors = SemanticDedup.anchors(dim = 4, k = 3, seed = 5L)
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, -1.0f, 0.5f)),
      (3L, Seq(-1.0f, -1.0f, 1.0f, 1.0f)),
      (4L, Seq(0.0f, 0.0f, 0.0f, 0.0f))   // all dots 0.0 -> tie -> cell 0
    ).toDF("vec_id", "embedding")
    val got = vecs.select(col("vec_id"),
        SemanticDedup.cellOf(col("embedding"), anchors).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def dot(v: Seq[Double], a: Seq[Double]) = v.zip(a).map { case (x, y) => x * y }.sum
    vecs.collect().foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val dots = anchors.map(a => dot(v, a))
      val want = dots.indexOf(dots.max)
      assert(got(r.getLong(0)) == want, s"vec ${r.getLong(0)}")
    }
    assert(got(4L) == 0)
  }

  test("semantic dedup: exact duplicates pair at cos 1, unrelated vectors unpaired") {
    val anchors = SemanticDedup.anchors(dim = 4, k = 2, seed = 5L)
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),     // duplicate of 1
      (3L, Seq(-4.0f, 3.0f, -2.0f, 1.0f))    // orthogonal to 1
    ).toDF("vec_id", "embedding")
    val pairs = SemanticDedup.nearDupPairs(vecs, col("vec_id"), col("embedding"),
        threshold = 0.9, anchorSeq = anchors)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(pairs.keySet == Set((1L, 2L)))
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-9)
    val drops = SemanticDedup.dropIds(vecs, col("vec_id"), col("embedding"),
        threshold = 0.9, anchorSeq = anchors)
      .collect().map(_.getLong(0)).toSet
    assert(drops == Set(2L), "keep-smallest drops the larger id only")
  }
}
