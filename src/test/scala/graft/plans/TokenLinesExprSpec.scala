package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TokenLinesExprSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // composition 1: the HOF line synthesizer (C36 fixture, pre-kernel)
  private def hofLines(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val nLines = ceil(size(toks) / lit(n.toDouble)).cast("int")
    array_join(
      transform(sequence(lit(0), nLines - 1),
        g => array_join(slice(toks, g * n + 1, lit(n)), " ")),
      "\n")
  }

  // composition 2: the group-capture regex paragraph synthesizer
  // (C82 fixture, pre-kernel)
  private def regexParas(text: Column, n: Int): Column = {
    val norm = regexp_replace(trim(text), "\\s+", " ")
    regexp_replace(norm, s"((?:[^ ]+ ){${n - 1}}[^ ]+) ", "$1\n\n")
  }

  private val edgeCases = Seq(
    "", " ", "one", "one two", "a b c d e f g h i j",      // exactly one group of 10
    "a b c d e f g h i j k",                                // 10 + 1
    (1 to 25).map("t" + _).mkString(" "),                   // len % n != 0
    (1 to 20).map("t" + _).mkString(" "),                   // len % n == 0
    "trailing space ",                                      // trailing 0x20 (Spark-trimmed)
    "trailing tab\t",                                       // trailing empty token
    "\tleading tab",                                        // leading empty token
    "runs   of    spaces collapse", "a  b")

  private def assertEq(df: DataFrame, a: Column, b: Column): Unit = {
    val bad = df.select(col("text"), a.as("k"), b.as("r"))
      .filter(!(col("k") <=> col("r"))).collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("kernel == HOF line synthesizer on the real corpus and edges") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    assertEq(docs, TokenLinesExpr.tokenLines(col("text"), 10, "\n"),
      hofLines(col("text"), 10))
    assertEq(edgeCases.toDF("text"),
      TokenLinesExpr.tokenLines(col("text"), 10, "\n"), hofLines(col("text"), 10))
    assertEq(edgeCases.toDF("text"),
      TokenLinesExpr.tokenLines(col("text"), 1, "\n"), hofLines(col("text"), 1))
  }

  test("kernel == group-capture regex paragraph synthesizer (no leading non-space ws)") {
    // Equality domain: text that does not START with non-space
    // whitespace after Spark's space-only trim. A leading tab is the
    // one place the two semantics genuinely differ (pinned below);
    // everything else — trailing tabs, runs, exact-multiple lengths —
    // must agree, as must the whole real corpus.
    val noLeading = edgeCases.filterNot(_.startsWith("\t"))
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    for (n <- Seq(1, 2, 8)) {
      assertEq(docs, TokenLinesExpr.tokenLines(col("text"), n, "\n\n"),
        regexParas(col("text"), n))
      assertEq(noLeading.toDF("text"),
        TokenLinesExpr.tokenLines(col("text"), n, "\n\n"), regexParas(col("text"), n))
    }
  }

  test("pinned divergence: leading non-space whitespace follows token-array semantics") {
    // regex form: Spark trim leaves the tab, \s+ -> " " turns it into
    // a LEADING SPACE the group pattern never consumes; token form:
    // the tab becomes an empty first token that occupies a group
    // slot (exactly what the HOF linedText composition does — test 1
    // holds on this same input). The kernel deliberately keeps the
    // token-array semantics, matching its C36 twin.
    val df = Seq("\tleading tab").toDF("text")
    val k = df.select(TokenLinesExpr.tokenLines(col("text"), 1, "\n\n")).first().getString(0)
    val r = df.select(regexParas(col("text"), 1)).first().getString(0)
    assert(k == "\n\nleading\n\ntab") // empty first group
    assert(r == " leading\n\ntab")    // preserved leading space
  }

  test("null in, null out; stays in codegen") {
    val df = Seq(Option("a b c"), None).toDF("text")
    val got = df.select(TokenLinesExpr.tokenLines(col("text"), 2, "\n").as("k"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("a b\nc"), None))
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val plan = docs.select(TokenLinesExpr.tokenLines(col("text"), 10, "\n").as("k"))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project.*"), s"not codegen'd:\n$plan")
  }
}
