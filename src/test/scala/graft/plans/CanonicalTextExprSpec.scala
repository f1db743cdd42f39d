package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CanonicalTextExprSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // the reference composition the kernel replaces (Dedup.normalizedForm
  // pre-kernel) — kept here as the oracle
  private def referenceForm(text: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  test("kernel == regex composition on the real documents corpus") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
        CanonicalTextExprOps.canonical(col("text")).as("k"),
        referenceForm(col("text")).as("r"))
      .filter(!(col("k") <=> col("r")))
    assert(diff.count() == 0)
  }

  test("kernel == regex composition on adversarial hand cases") {
    val cases = Seq(
      "", " ", "\t\n\u000b\f\r", "a", "A", "  A  b\t\tC  ",
      "a.b", "a . b", "..!!..", "a..b  ..  c",
      "MiXeD CaSe 123 and-hyphens_under", "1~2~3 tok~1 tok~2",
      "ends with punct!", "!starts with punct",
      "ünïcödé ÉTRANGE mixed ascii Tail", "pure ünïcödé",
      "\u00a0nbsp is not java \\s\u00a0", "Kelvin \u212a sign",
      "emoji 🙂 inside", "çedilla Ça va", "i\u0307 dotted")
    val df = cases.toDF("text")
    val bad = df.select(col("text"),
        CanonicalTextExprOps.canonical(col("text")).as("k"),
        referenceForm(col("text")).as("r"))
      .filter(!(col("k") <=> col("r")))
      .collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("property: kernel == regex composition on random ascii+unicode strings") {
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar),
      (3, Gen.oneOf(' ', '\t', '\n', '\u000b', '\f', '\r')),
      (3, Gen.oneOf("!@#$%^&*()-_=+[]{};:'\",.<>/?\\|`".toSeq)),
      (1, Gen.oneOf('é', 'Ü', 'ß', 'ç', '中', '\u00a0', '\u212a')))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val samples = Gen.listOfN(300, strGen)
      .apply(Gen.Parameters.default, Seed(20260815L)).getOrElse(Nil)
    assert(samples.nonEmpty)
    val df = samples.toDF("text")
    val bad = df.select(col("text"),
        CanonicalTextExprOps.canonical(col("text")).as("k"),
        referenceForm(col("text")).as("r"))
      .filter(!(col("k") <=> col("r")))
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("codegen and interpreted agree; null stays null; SQL registration works") {
    val df = Seq(Some("  A.b\tC  "), None).toDF("text")
    val expr = CanonicalTextExpr(
      org.apache.spark.sql.graftshim.GraftSqlShim.expression(col("text")))
    // interpreted eval through nullSafeEval
    val interp = df.select(CanonicalTextExprOps.canonical(col("text")).as("k"))
      .collect().map(r => Option(r.getString(0)))
    assert(interp.toSeq == Seq(Some("ab c"), None))
    // the projection sits inside a WholeStageCodegen stage on a
    // parquet-backed read (local relations can constant-fold)
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val plan = docs.select(CanonicalTextExprOps.canonical(col("text")).as("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("canonicaltextexpr") || plan.matches("(?s).*\\*\\(\\d+\\) Project.*"),
      s"not codegen'd:\n$plan")
    assert(expr.dataType == org.apache.spark.sql.types.StringType)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("ct_in")
    val viaSql = spark.sql("SELECT graft_canonical_text(text) AS k FROM ct_in")
      .collect().map(r => Option(r.getString(0)))
    assert(viaSql.toSeq == Seq(Some("ab c"), None))
  }
}
