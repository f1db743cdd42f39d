package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the round-5 operators: duplicate spans, boilerplate line
  * removal, bigram LM scoring, temperature mixing, length-bucketed
  * batching.
  */
class Round5OpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ----------------------------------------------------------------- DupSpans

  test("duplicated spans: shared 5-token window counted in both docs, unique spans not") {
    // docs 1 and 2 share the span "p q r s t"; doc 3 shares nothing.
    val docs = Seq(
      (1L, "p q r s t u"),          // spans: pqrst, qrstu
      (2L, "x p q r s t"),          // spans: xpqrs, pqrst
      (3L, "a b c d e f")           // spans: abcde, bcdef
    ).toDF("doc_id", "text")
    val got = DupSpans.duplicatedSpans(docs, col("doc_id"), col("text"), k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
  }

  test("duplicated spans: repeats WITHIN one doc don't count, short docs fall back to whole text") {
    val docs = Seq(
      (1L, "m m m m m m m m m m"),  // one distinct span "m m m m m", only in this doc
      (2L, "tiny doc"),             // < k tokens: single whole-text span
      (3L, "tiny doc")              // exact dup of doc 2 => duplicated span
    ).toDF("doc_id", "text")
    val got = DupSpans.duplicatedSpans(docs, col("doc_id"), col("text"), k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((1L, 0L))) // within-doc repetition is not cross-doc duplication
    assert(got(2L) == ((1L, 1L)))
    assert(got(3L) == ((1L, 1L)))
  }

  test("span removal: cross-doc duplicated spans drop their covered tokens, others survive") {
    // docs 1 and 2 share "p q r s t"; doc 3 is clean; doc 4 repeats
    // a span WITHIN itself only (not cross-doc -> kept).
    val docs = Seq(
      (1L, "x p q r s t y"),
      (2L, "p q r s t z"),
      (3L, "a b c d e f"),
      (4L, "m n o p m n o p q q")
    ).toDF("doc_id", "text")
    val got = DupSpans.removeDuplicatedSpans(docs, col("doc_id"), col("text"), k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((7L, 5L, md5Hex("x y"))))
    assert(got(2L) == ((6L, 5L, md5Hex("z"))))
    assert(got(3L) == ((6L, 0L, md5Hex("a b c d e f"))))
    assert(got(4L) == ((10L, 0L, md5Hex("m n o p m n o p q q"))))
  }

  test("span removal: fully-duplicated docs keep their row with the empty md5; short docs untouched") {
    val docs = Seq(
      (1L, "p q r s t"), (2L, "p q r s t"),   // exact 5-token dups -> everything removed
      (3L, "tiny doc")                         // < k tokens: no spans, untouched
    ).toDF("doc_id", "text")
    val got = DupSpans.removeDuplicatedSpans(docs, col("doc_id"), col("text"), k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((5L, 5L, md5Hex(""))))
    assert(got(2L) == ((5L, 5L, md5Hex(""))))
    assert(got(3L) == ((2L, 0L, md5Hex("tiny doc"))))
  }

  // -------------------------------------------------------------- Boilerplate

  test("boilerplate lines in > maxDocFreq docs are stripped; doc reassembles in order") {
    val footer = "all rights reserved"
    val docs = Seq(
      (1L, s"alpha one\n$footer"),
      (2L, s"beta two\n$footer\nbeta tail"),
      (3L, s"gamma three\n$footer"),
      (4L, "delta four")
    ).toDF("doc_id", "text")
    val got = Boilerplate.removeCommonLines(docs, col("doc_id"), col("text"), maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((md5Hex("alpha one"), 1L, 1L)))
    assert(got(2L) == ((md5Hex("beta two\nbeta tail"), 2L, 1L)))
    assert(got(3L) == ((md5Hex("gamma three"), 1L, 1L)))
    assert(got(4L) == ((md5Hex("delta four"), 1L, 0L)))
  }

  test("boilerplate: a doc that is ALL boilerplate keeps its row with the empty-string md5") {
    val docs = Seq(
      (1L, "spam"), (2L, "spam"), (3L, "spam"), (4L, "spam")
    ).toDF("doc_id", "text")
    val got = Boilerplate.removeCommonLines(docs, col("doc_id"), col("text"), maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 4)
    assert(got(1L) == ((md5Hex(""), 0L, 1L)))
  }

  // ------------------------------------------------------------------ NgramLm

  test("bigram LM score matches hand-computed interpolated probabilities") {
    // corpus: "a b a b" + "a b" + "a". uni: a=4 b=3 T=7; bi: (a,b)=3 (b,a)=1.
    // p(b|a) = .5*3/4 + .5*3/7 = 0.589285...   ln = -0.52884...
    // p(a|b) = .5*1/3 + .5*4/7 = 0.452380...   ln = -0.79323...
    // micro-nat floors: -528845, -793231.
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "a")).toDF("doc_id", "text")
    val got = NgramLm.bigramScore(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc 1: (-528845*2 - 793231) / 3e6 = -0.616973... -> -0.617
    assert(got(1L) == ((3L, -0.617)))
    // doc 2: -528845 / 1e6 -> -0.5288
    assert(got(2L) == ((1L, -0.5288)))
    // doc 3: no bigrams
    assert(got(3L) == ((0L, 0.0)))
  }

  test("bigram LM: tokenization lowercases and collapses whitespace") {
    val a = Seq((1L, "A  b a B"), (2L, "a b")).toDF("doc_id", "text")
    val b = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val ra = NgramLm.bigramScore(a, col("doc_id"), col("text")).collect().map(_.toSeq).toSet
    val rb = NgramLm.bigramScore(b, col("doc_id"), col("text")).collect().map(_.toSeq).toSet
    assert(ra == rb)
  }

  // ----------------------------------------------------- temperatureSample

  test("temperature mixing: sqrt-proportional targets, capped by group size") {
    // sizes A=16, B=4: sqrt 4 and 2, denom 6; budget 6 -> targets 4 and 2.
    val rows = (1 to 16).map(i => (i.toLong, "A")) ++ (17 to 20).map(i => (i.toLong, "B"))
    val df = rows.toDF("id", "grp")
    val got = Sampling.temperatureSample(df, col("grp"), col("id"), budget = 6)
    val perGroup = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup == Map("A" -> 4L, "B" -> 2L))
    // flattening: B holds 20% of rows but 1/3 of the sample
  }

  test("temperature mixing is deterministic under repartitioning") {
    val rows = (1 to 50).map(i => (i.toLong, if (i % 3 == 0) "x" else "y"))
    val df = rows.toDF("id", "grp")
    val a = Sampling.temperatureSample(df, col("grp"), col("id"), budget = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(df.repartition(7, col("id")), col("grp"), col("id"), budget = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  // ------------------------------------------------------------ lengthBatches

  test("length batches: bucket arithmetic and over-budget singleton batches") {
    val df = Seq(
      (1L, 5L), (2L, 30L),   // bucket 0, padded 32, batch_size 16
      (3L, 33L), (4L, 64L),  // bucket 1, padded 64, batch_size 8
      (5L, 600L)             // bucket 18, padded 608 > budget -> batch_size 1
    ).toDF("doc_id", "n_tokens")
    val got = Packing.lengthBatches(df, col("doc_id"), col("n_tokens"),
        bucketWidth = 32, maxBatchTokens = 512)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L)._1 == 0L && got(1L)._2 == 32L)
    assert(got(3L)._1 == 1L && got(3L)._2 == 64L)
    assert(got(4L)._1 == 1L && got(4L)._2 == 64L)
    assert(got(5L) == ((18L, 608L, 0L)))
    // small buckets fit one batch each
    assert(got(1L)._3 == 0L && got(2L)._3 == 0L && got(3L)._3 == 0L && got(4L)._3 == 0L)
  }

  test("length batches: every batch stays within the padded-token budget (or is a singleton)") {
    val df = (1L to 200L).map(i => (i, (i * 37 % 90) + 1)).toDF("doc_id", "n_tokens")
    val got = Packing.lengthBatches(df, col("doc_id"), col("n_tokens"),
      bucketWidth = 16, maxBatchTokens = 128)
    val bad = got.groupBy("bucket", "batch_id")
      .agg(count(lit(1)).as("n"), max("padded_len").as("p"))
      .filter(col("n") * col("p") > 128 && col("n") > 1)
    assert(bad.count() == 0)
  }
}
