package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("token counts handle spacing edge cases") {
    val df = Seq(
      (1L, "one two three"),
      (2L, "  padded   with   runs  "),
      (3L, "single")).toDF("id", "text")
    val r = df.select(col("id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 1L))
  }

  test("bpe-ish count splits words, digits, and symbols") {
    val df = Seq((1L, "Hello, world 42!")).toDF("id", "text")
    // Hello(1) ,(2) world(3) 4(4) 2(5) !(6)
    val n = df.select(TextAnalysis.bpeTokenCount(col("text"))).first().getLong(0)
    assert(n == 6L)
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der Hund und die Katze von dem Haus"),
      (3L, "le chat et le chien de la maison"),
      (4L, "el gato y el perro de la casa"),
      (5L, "xyzzy plugh abracadabra")).toDF("id", "text")
    val r = df.select(col("id"), TextAnalysis.langId(col("text")).as("lang"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "en")
    assert(r(2L) == "de")
    assert(r(3L) == "fr")
    assert(r(4L) == "es")
    assert(r(5L) == "und")
  }

  test("word shingles are distinct ordered k-grams") {
    val df = Seq((1L, "a b c d")).toDF("id", "text")
    val sh = df.select(TextAnalysis.wordShingles(col("text"), 3).as("s"))
      .first().getSeq[String](0).toSet
    assert(sh == Set("a b c", "b c d"))
    // short text falls back to the whole token string
    val short = Seq((1L, "a b")).toDF("id", "text")
      .select(TextAnalysis.wordShingles(col("text"), 3).as("s"))
      .first().getSeq[String](0).toSet
    assert(short == Set("a b"))
  }

  test("fingerprints are deterministic") {
    val df = Seq((1L, "stable content"), (2L, "stable content")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprintMd5(col("text")).as("m"),
      TextAnalysis.shingleFingerprint(col("text")).as("s")).collect()
    assert(fps(0).getString(0) == fps(1).getString(0))
    assert(fps(0).getLong(1) == fps(1).getLong(1))
  }
}
