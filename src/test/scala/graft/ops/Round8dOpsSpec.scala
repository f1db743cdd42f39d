package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the fourth round-8 operator batch: record linkage,
  * decision stump, deflate-ratio kernel.
  */
class Round8dOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ---------------------------------------------------- RecordLinkage

  private val rules = Seq(
    RecordLinkage.FieldRule("name", 4000L, -500L),
    RecordLinkage.FieldRule("city", 1000L, -300L))

  test("score: agreement mask, milli sum, and classification") {
    val left = Seq((1L, 10L, "ann", "rome"), (2L, 10L, "bob", "pisa"))
      .toDF("rid", "block", "name", "city")
    val right = Seq((101L, 10L, "ann", "rome"), (102L, 10L, "ann", "oslo"),
      (103L, 20L, "ann", "rome"))
      .toDF("rid", "block", "name", "city")
    val got = RecordLinkage.score(left, right, rules,
        tMatch = 4000L, tPossible = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // both fields agree: mask 3, 5000, match
    assert(got((1L, 101L)) == ((3L, 5000L, "match")))
    // name only: mask 1, 4000 - 300 = 3700 -> possible
    assert(got((1L, 102L)) == ((1L, 3700L, "possible")))
    // different block never paired; disagree-everything filtered by t
    assert(!got.contains((1L, 103L)) && !got.contains((2L, 103L)))
    // bob vs ann twins score below tPossible on every pairing
    assert(!got.contains((2L, 101L)) && !got.contains((2L, 102L)))
  }

  test("score treats null fields as disagreement, null-safely") {
    val left = Seq((1L, 1L, null.asInstanceOf[String], "rome"))
      .toDF("rid", "block", "name", "city")
    val right = Seq((2L, 1L, null.asInstanceOf[String], "rome"))
      .toDF("rid", "block", "name", "city")
    // null <=> null is TRUE under null-safe equality — the rule says
    // both-missing counts as agreement (documented FS convention here)
    val got = RecordLinkage.score(left, right, rules, 5000L, 0L).collect()
    assert(got.length == 1 && got(0).getLong(3) == 5000L
      && got(0).getString(4) == "match")
  }

  test("scoreSql twin matches the operator on a DuckDB-free check") {
    // structural check only (DuckDB runs driver-side): the SQL embeds
    // the same weights and thresholds
    val sql = RecordLinkage.scoreSql("SELECT 1", "SELECT 2", rules, 3000L, 600L)
    assert(sql.contains("4000") && sql.contains("-500")
      && sql.contains(">= 600") && sql.contains(">= 3000"))
  }

  // ---------------------------------------------------- DecisionStump

  test("splitScores: exact Gini arithmetic on a hand-computed split") {
    // feature 1: 3 pos, 1 neg; feature 2: 1 pos, 3 neg
    val rows = Seq.fill(3)((1L, true)) ++ Seq((1L, false)) ++
      Seq((2L, true)) ++ Seq.fill(3)((2L, false))
    val got = DecisionStump.splitScores(rows.toDF("f", "y"), col("f"), col("y"))
      .collect()
    assert(got.length == 1) // only t=1 splits (t=2 leaves empty right)
    val r = got(0)
    // left (f<=1): 3+, 1-; right: 1+, 3-
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 1L, 1L, 3L)))
    // score = (16-9-1)/4 + (16-1-9)/4 = 1.5 + 1.5 = 3.0 -> 3000 milli
    assert(r.getLong(5) == 3000L && r.getLong(6) == 1L)
  }

  test("fit finds the perfectly separating threshold") {
    val rows = (1L to 50L).map(i => (i, i <= 30L))
    val got = DecisionStump.fit(rows.toDF("f", "y"), col("f"), col("y")).collect()(0)
    assert(got.getLong(0) == 30L)           // threshold
    assert(got.getLong(5) == 0L)            // pure split: zero impurity
    assert(got.getBoolean(6) && !got.getBoolean(7)) // left true, right false
  }

  test("splitScores rank ties break toward the smaller threshold") {
    // symmetric data: thresholds 1 and 2 give identical scores
    val rows = Seq((1L, true), (2L, false), (3L, true))
    val got = DecisionStump.splitScores(rows.toDF("f", "y"), col("f"), col("y"))
      .orderBy(col("rk")).collect()
    assert(got.map(_.getLong(0)).length == 2)
    val sameScore = got.map(_.getLong(5)).distinct
    if (sameScore.length == 1) assert(got(0).getLong(0) < got(1).getLong(0))
  }

  // ------------------------------------------------ DeflateRatioExpr

  import graft.plans.{DeflateRatioExprOps, DeflateRatioOps}
  import org.apache.spark.unsafe.types.UTF8String

  test("deflate ratio orders template < prose < random-ish") {
    val template = "the same line again\n" * 50
    val prose = "a quick brown fox jumped over the lazy dog while " +
      "seventeen sailors argued about the weather in late november " +
      "and nobody agreed on anything important that day at all" * 3
    var x = 88172645463325252L
    val noise = (1 to 1000).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % 93) + 33).toChar
    }.mkString
    def m(s: String) = DeflateRatioOps.ratioMilli(UTF8String.fromString(s))
    assert(m(template) < m(prose) && m(prose) < m(noise))
    assert(m("") == 0L)
  }

  test("deflate ratio: column path == direct kernel, incl. codegen") {
    val docs = Seq("aaaaaaaaaaaaaaaaaaaaaaaa", "mixed content 123 mixed",
      "", "Ünïcødé ẗëxt — ratio over UTF-8 bytes").toDF("text")
    val viaCol = docs.select(DeflateRatioExprOps.ratioMilli(col("text")))
      .collect().map(_.getLong(0))
    val direct = docs.collect().map(r =>
      DeflateRatioOps.ratioMilli(UTF8String.fromString(r.getString(0))))
    assert(viaCol.toSeq == direct.toSeq)
  }

  test("deflate ratio SQL registration works") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_deflate_ratio('abcabcabcabcabcabcabcabc') AS r")
      .collect()(0).getLong(0)
    assert(got > 0L && got < 1000L) // compresses, but not to nothing
  }

  test("deflate ratio null-safety") {
    val got = Seq[Option[String]](Some("xx"), None).toDF("text")
      .select(DeflateRatioExprOps.ratioMilli(col("text")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(got(1) == -1L && got(0) >= 0L)
  }
}
