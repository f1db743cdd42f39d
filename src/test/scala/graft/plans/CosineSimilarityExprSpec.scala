package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.VectorFunctions

class CosineSimilarityExprSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("native expression matches the HOF composition bit-for-bit on real embeddings") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(
        VectorFunctions.cosineSimilarity(col("embedding"), col("qv")).as("native"),
        VectorFunctions.cosineSimilarityHof(col("embedding"), col("qv")).as("hof"))
    // exact: identical IEEE operation order
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("expression participates in whole-stage codegen") {
    // parquet-backed so the projection can't constant-fold away
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(CosineSimilarityExpr.cosine(
      col("embedding").cast("array<double>"),
      col("embedding").cast("array<double>")).as("c"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[cosinesimilarityexpr.*"),
      s"expression not inside a codegen stage:\n$plan")
    // self-similarity is exactly 1.0 modulo fp; dot/(|a||a|)
    assert(df.filter(abs(col("c") - 1.0) > 1e-9).count() == 0)

    val small = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(CosineSimilarityExpr.cosine(col("a"), col("b")).as("c"))
    val v = small.first().getDouble(0)
    val expect = 11.0 / (math.sqrt(5.0) * math.sqrt(25.0))
    assert(v == expect)
  }

  test("null input yields null, mismatched lengths yield null (HOF parity)") {
    // a truncated-prefix score would let malformed vectors pass
    // silently; the zip_with/aggregate baseline nulls them, so the
    // kernel must too (r6 review finding)
    val df = Seq(
      (Some(Array(1.0, 0.0)), Some(Array(1.0, 0.0, 5.0))),
      (None, Some(Array(1.0, 0.0)))).toDF("a", "b")
      .select(CosineSimilarityExpr.cosine(col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
  }
}
class WordShinglesExprSpec extends AnyFunSuite with SparkTestBase {
  test("native shingles match the HOF baseline on real documents") {
    val d = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val cmp = d.select(
      graft.ops.TextAnalysis.wordShingles(col("text"), 3).as("native"),
      graft.ops.TextAnalysis.wordShinglesHof(col("text"), 3).as("hof"))
    assert(cmp.filter(not(col("native") <=> col("hof"))).count() == 0)
    // short-text fallback
    import spark.implicits._
    val short = Seq("a b").toDF("text")
      .select(graft.ops.TextAnalysis.wordShingles(col("text"), 3).as("s"))
      .first().getSeq[String](0)
    assert(short == Seq("a b"))
  }
}
class SimHashExprSpec extends AnyFunSuite with SparkTestBase {
  test("native simhash matches the aggregation baseline on real documents") {
    val d = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val native = graft.ops.Dedup.simHashSignatures(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = graft.ops.Dedup.simHashSignaturesAgg(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == agg)
  }

  test("native md5 minhash signature matches its HOF baseline on real documents") {
    val d = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        graft.ops.TextAnalysis.wordShingles(col("text"), 3).as("shingles"))
    val native = d.select(col("doc_id"),
        graft.plans.MinHashMd5Expr.minhashSig(col("shingles"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = d.select(col("doc_id"),
        graft.ops.Dedup.minHashMd5SignatureHof(col("shingles"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == hof)
    assert(native.values.forall(s => s.length == 16 && s.forall(v => v >= 0 && v < graft.plans.MinHashOps.P)))
  }

  test("native md5 simhash matches its aggregation baseline and stays in 60 bits") {
    val d = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val native = d.select(col("doc_id"),
        graft.plans.SimHashMd5Expr.simhash60(col("text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = graft.ops.Dedup.simHashMd5SignaturesAgg(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == agg)
    assert(native.values.forall(s => s >= 0L && s < (1L << 60)))
  }
}
