package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SpanHashesExprSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val K = 5

  // the composed pipeline the kernel replaces — kept as the oracle
  private def composedSpans(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= K)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("toks")) - (K - 1)),
          p => graft.ops.Dedup.md5Hash60(array_join(slice(col("toks"), p, lit(K)), " ")))))

  private def kernelSpans(df: DataFrame): DataFrame =
    df.select(col("doc_id"), SpanHashesExpr.spanHashes(col("text"), K).as("shs"))
      .select(col("doc_id"), posexplode(col("shs")))

  private def assertParity(df: DataFrame): Unit = {
    val a = composedSpans(df).withColumnRenamed("col", "h")
    val b = kernelSpans(df).withColumnRenamed("col", "h")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "kernel span hashes differ from the composed pipeline")
  }

  test("bit-identical (doc, pos, hash) triples on the real corpus") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    assertParity(docs)
    // sanity: the corpus actually produces spans
    assert(kernelSpans(docs).count() > 0)
  }

  test("edge semantics match the composition exactly") {
    // Spark trim strips 0x20 only, split(\\s+) keeps trailing
    // empties (limit -1): leading tabs and trailing whitespace
    // produce empty tokens in BOTH forms — pin it
    val edge = Seq(
      (1L, "one two three four five six"),
      (2L, "\tlead tab one two three four"),       // leading empty token
      (3L, "trail space one two three four \t"),   // trailing empty token
      (4L, "only four tokens here"),               // < K -> no spans
      (5L, ""),                                    // empty -> no spans
      (6L, "   "),                                 // spaces only
      (7L, "MiXeD Case GETS lowered First pass"),
      (8L, "a  b   c\td e f g h"),                 // run collapse
      (9L, "unicode Ünïcödé tokens also flow through fine"))
      .toDF("doc_id", "text")
    assertParity(edge)
    // < K tokens yields an EMPTY array, not null
    val short = Seq((4L, "only four tokens here")).toDF("doc_id", "text")
      .select(SpanHashesExpr.spanHashes(col("text"), K).as("shs")).first()
    assert(short.getSeq[Long](0).isEmpty)
  }

  test("null in, null out; SQL registration; hash values are md5Hash60") {
    val df = Seq((1L, Option("a b c d e f")), (2L, None)).toDF("doc_id", "text")
    val got = df.select(SpanHashesExpr.spanHashes(col("text"), K).as("shs"))
      .collect().map(r => Option(r.get(0)))
    assert(got(1).isEmpty && got(0).nonEmpty)
    // first span of "a b c d e f" is "a b c d e"
    val h = df.filter(col("doc_id") === 1L)
      .select(explode(SpanHashesExpr.spanHashes(col("text"), K)).as("h"))
      .orderBy(col("h")).collect().map(_.getLong(0)).toSet
    val expect = Seq("a b c d e", "b c d e f").toDF("s")
      .select(graft.ops.Dedup.md5Hash60(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSet
    assert(h == expect)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("sh_in")
    val viaSql = spark.sql(s"SELECT graft_span_hashes(text, $K) AS shs FROM sh_in WHERE doc_id = 1")
      .select(explode(col("shs")).as("h")).collect().map(_.getLong(0)).toSet
    assert(viaSql == expect)
  }
}
