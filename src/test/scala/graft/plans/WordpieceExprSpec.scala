package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

class WordpieceExprSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val vocab = Seq(
    "un", "aff", "##aff", "##able", "play", "##ing", "the", "a", "##a", "b")

  test("greedy longest-match pieces with continuation prefixes and UNK fallback") {
    val got = Seq("unaffable", "playing", "xyz", "unz", "the")
      .toDF("w")
      .select(WordpieceExpr.tokens(col("w"), vocab).as("t"),
        WordpieceExpr.count(col("w"), vocab).as("n"))
      .collect()
      .map(r => (r.getSeq[String](0).toList, r.getLong(1)))
    assert(got(0) == (List("un", "##aff", "##able"), 3L))
    assert(got(1) == (List("play", "##ing"), 2L))
    assert(got(2) == (List("[UNK]"), 1L)) // no match anywhere
    // partial-match rollback: "un" matches but "##z" does not → one UNK
    assert(got(3) == (List("[UNK]"), 1L))
    assert(got(4) == (List("the"), 1L))
  }

  test("multi-word strings: counts sum per word, case and whitespace normalize") {
    val got = Seq("The   PLAYING unaffable").toDF("w")
      .select(WordpieceExpr.count(col("w"), vocab).as("n"),
        WordpieceExpr.tokens(col("w"), vocab).as("t"))
      .collect().head
    assert(got.getLong(0) == 1 + 2 + 3)
    assert(got.getSeq[String](1).size == 6)
  }

  test("codegen path matches the interpreted kernel on real documents") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val v = Seq("spark", "table", "row", "##s", "key", "agg", "value", "part",
      "hash", "a", "##a", "the", "win", "##dow", "sort", "merge", "batch")
    val fromDf = docs.select(col("doc_id"), WordpieceExpr.count(col("text"), v).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vv = new WordpieceOps.Vocab(v)
    val expected = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> WordpieceOps.count(UTF8String.fromString(r.getString(1)), vv))
      .toMap
    assert(fromDf == expected)
    // and the count always equals the pieces length
    val both = docs.select(WordpieceExpr.count(col("text"), v).as("n"),
        size(WordpieceExpr.tokens(col("text"), v)).as("m"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getInt(1).toLong))
  }
}
