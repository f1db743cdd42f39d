package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the seventh round-8 operator batch: k-center coreset,
  * one-pass Naive Bayes, interval union.
  */
class Round8gOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // -------------------------------------------------------- k-center

  private def points(ps: (Long, Seq[Double])*) =
    ps.toDF("vec_id", "embedding")

  test("kcenter: picks the farthest point each round, seed = min id") {
    // 1-d line: 0, 1, 10, 11, 100 (ids 1..5); seed id 1 (x=0),
    // round 2 -> x=100 (id 5), round 3 -> x=10 or 11: min-dists are
    // 100 (10^2... ) compute: to {0,100}: 10->100, 11->121 -> picks 11? no:
    // dist 10->0 is 100, 10->100 is 8100 -> md 100; 11: md 121 -> 11 wins.
    val df = points(1L -> Seq(0.0), 2L -> Seq(0.001), 3L -> Seq(0.01),
      4L -> Seq(0.011), 5L -> Seq(0.1))
    // scale 1000 -> quantized 0, 1, 10, 11, 100
    val got = KCenter.select(df, col("vec_id"), col("embedding"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 2L),      // seed covers 0,1
      (2L, 5L, 100L * 100L, 1L), // farthest from 0 is 100
      (3L, 4L, 11L * 11L, 2L)))  // md to {0,100}: 11^2=121 > 10^2
  }

  test("kcenter: selected ids are excluded so duplicates cannot stall") {
    val df = points(1L -> Seq(0.0), 2L -> Seq(0.0), 3L -> Seq(0.0))
    val got = KCenter.select(df, col("vec_id"), col("embedding"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // all duplicate vectors: rounds still pick distinct ids at dist 0
    assert(got.toSeq == Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L)))
  }

  test("kcenter: k exceeding corpus size fails loudly") {
    val df = points(1L -> Seq(0.0))
    intercept[IllegalArgumentException] {
      KCenter.select(df, col("vec_id"), col("embedding"), k = 2).collect()
    }
  }

  test("kcenter: coverage counts sum to corpus size and assignment ties go to earliest rank") {
    val df = points(1L -> Seq(0.0), 2L -> Seq(0.004), 3L -> Seq(0.004),
      4L -> Seq(0.008))
    // quantized 0, 4, 4, 8; seed 0; round2 picks id4 (x=8, dist 64)
    val got = KCenter.select(df, col("vec_id"), col("embedding"), k = 2).collect()
    assert(got.map(_.getLong(3)).sum == 4L)
    // 4 and 4 are equidistant (16) from 0 and 8 -> earliest rank (seed)
    assert(got.map(r => (r.getLong(1), r.getLong(3))).toSeq ==
      Seq((1L, 3L), (4L, 1L)))
  }

  // ------------------------------------------------------ NaiveBayes

  test("nbayes: separable vocabularies classify the held-out docs") {
    // ids chosen so the nbsplit hash puts some in test; craft corpus
    // big enough that every class appears in train
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "aa aa bb", "en") else (i, "zz zz yy", "fr")
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val got = NaiveBayes.confusion(df, col("doc_id"), col("text"), col("lang"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // perfectly separable: confusion is diagonal
    assert(got.forall { case (t, p, _) => t == p })
    assert(got.map(_._3).sum > 0)
  }

  test("nbayes: zero-token test docs score prior-only and survive") {
    // majority class en; a whitespace-only doc in the test split must
    // be predicted en (larger prior), not dropped
    val rows = (0L until 50L).map { i =>
      if (i < 40L) (i, "aa bb", "en") else (i, "zz", "fr")
    }
    val df = rows.toDF("doc_id", "text", "lang")
    // find a test-split id (hash % 5 == 0) and blank its text
    val testIds = df.select(col("doc_id"))
      .filter(Dedup.md5Hash60(concat(lit("nbsplit:"), col("doc_id").cast("string"))) % 5 === 0)
      .as[Long].collect()
    assert(testIds.nonEmpty)
    val blanked = df.withColumn("text",
      when(col("doc_id") === testIds.head, lit("   ")).otherwise(col("text")))
    val conf = NaiveBayes.confusion(blanked, col("doc_id"), col("text"), col("lang"))
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(conf == testIds.length.toLong)
  }

  test("nbayes: train/test split is the documented hash device") {
    val df = (0L until 30L).map(i => (i, "tok", "en")).toDF("doc_id", "text", "lang")
    val nTest = df.filter(
      Dedup.md5Hash60(concat(lit("nbsplit:"), col("doc_id").cast("string"))) % 5 === 0
    ).count()
    val scored = NaiveBayes.confusion(df, col("doc_id"), col("text"), col("lang"))
      .agg(coalesce(sum("n_docs"), lit(0L))).collect()(0).getLong(0)
    assert(scored == nTest)
  }

  // --------------------------------------------------- IntervalUnion

  private def ivStats(rows: Seq[(String, Long, Long)]) =
    IntervalUnion.unionStats(rows.toDF("k", "s", "e"),
      col("k"), col("s"), col("e"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sortBy(_._1)

  test("interval union: overlap merges, gap splits, stats are exact") {
    val got = ivStats(Seq(
      ("a", 0L, 10L), ("a", 5L, 20L),   // overlap -> island [0,20]
      ("a", 30L, 40L),                  // gap 10 -> island [30,40]
      ("b", 0L, 5L)))
    assert(got == Seq(("a", 3L, 2L, 30L, 10L), ("b", 1L, 1L, 5L, 0L)))
  }

  test("interval union: touching intervals merge (closed semantics)") {
    val got = ivStats(Seq(("a", 0L, 10L), ("a", 10L, 20L)))
    assert(got == Seq(("a", 2L, 1L, 20L, 0L)))
  }

  test("interval union: contained and duplicate intervals do not inflate the union") {
    val got = ivStats(Seq(
      ("a", 0L, 100L), ("a", 10L, 20L), ("a", 10L, 20L), ("a", 0L, 100L)))
    assert(got == Seq(("a", 4L, 1L, 100L, 0L)))
  }

  test("interval union: max_gap is the largest inter-island hole") {
    val got = ivStats(Seq(
      ("a", 0L, 1L), ("a", 5L, 6L), ("a", 100L, 101L)))
    assert(got == Seq(("a", 3L, 3L, 3L, 94L)))
  }
}
