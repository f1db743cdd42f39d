package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SpanHitsExprSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val K = 5

  private def ungated(train: DataFrame, eval: DataFrame): DataFrame = {
    def spans(df: DataFrame) =
      df.select(col("doc_id").cast("bigint").as("__id"),
          SpanHashesExpr.spanHashes(col("text"), K).as("shs"))
        .select(col("__id"), posexplode(col("shs")))
        .select(col("__id"), (col("pos") + 1).cast("bigint").as("p"),
          col("col").as("shash"))
    val ev = spans(eval).select(col("shash"), col("__id").as("eval_id")).distinct()
    spans(train).join(broadcast(ev), Seq("shash"))
      .select(col("__id").as("doc_id"), col("p").as("pos"), col("eval_id"))
  }

  test("bloom-gated spanHits == ungated exact join on the real corpus") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val gated = graft.ops.Decontaminate.spanHits(train, col("doc_id"), col("text"),
      eval, col("doc_id"), col("text"), K)
    val exact = ungated(train, eval)
    assert(gated.exceptAll(exact).count() == 0 && exact.exceptAll(gated).count() == 0)
    assert(exact.count() > 0, "fixture must actually produce hits")
  }

  test("a deliberately tiny bloom (high FP rate) still yields the exact result") {
    // 64-bit bloom stuffed with every eval span: almost everything is
    // a false positive at the gate — the confirm join must kill them
    val train = Seq((1L, "a b c d e f g h"), (2L, "x y z w v u t s"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "c d e f g"), (101L, "p q r s t")).toDF("doc_id", "text")
    val evalSpans = eval
      .select(col("doc_id").as("eval_id"),
        explode(SpanHashesExpr.spanHashes(col("text"), K)).as("shash"))
      .distinct()
    val tinyBloom = evalSpans
      .agg(BloomSketch.sketch(col("shash"), 64, 4).as("b")).scalar()
    val viaTiny = train
      .select(col("doc_id"),
        explode(SpanHitsExpr.spanHits(col("text"), tinyBloom, K)).as("hit"))
      .select(col("hit.shash").as("shash"), col("doc_id"), col("hit.p").as("pos"))
      .join(broadcast(evalSpans), Seq("shash"))
      .select(col("doc_id"), col("pos"), col("eval_id"))
    val got = viaTiny.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only doc 1 contains an eval span ("c d e f g" at 1-based pos 3)
    assert(got == Set((1L, 3L, 100L)))
  }

  test("null text and empty eval side produce zero rows, not errors") {
    val train = Seq((1L, Option("a b c d e f")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val eval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = graft.ops.Decontaminate.spanHits(train, col("doc_id"), col("text"),
      eval, col("doc_id"), col("text"), K)
    assert(out.count() == 0)
  }
}
