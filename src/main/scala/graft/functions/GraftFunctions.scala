package graft.functions

import org.apache.spark.sql.SparkSession

import graft.plans.{BloomContainsExpr, BloomSketch, BloomSketchAgg, BloomUnionAgg, CanonicalTextExpr, CharEntropyExpr, SpanHashesExpr, CmsQueryExpr, CmsSketch, CmsSketchAgg, CmsUnionAgg, CosineSimilarityExpr, DeflateRatioExpr, FreqSketch, FreqSketchAgg, HllEstimateExpr, HllSketch, HllSketchAgg, HllUnionAgg, QuantileEstimateExpr, QuantileSketch, QuantileSketchAgg, QuantileUnionAgg, QualityScoreExpr, RepetitionStatsExpr, SimHashExpr, TermCountsExpr, ThetaEstimateExpr, ThetaIntersectExpr, ThetaSketch, ThetaSketchAgg, ThetaUnionAgg, TopKAgg, TopKAggExpr, WordpieceCountExpr, WordpieceTokensExpr, WordShinglesExpr}

/** SQL registration for graft's native expressions, so
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works wherever the
  * DataFrame API does (the reference's execute-arbitrary-SQL surface
  * extends to the custom kernels).
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => CosineSimilarityExpr(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_simhash",
      exprs => SimHashExpr(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_shingles",
      exprs => WordShinglesExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Int]),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_hll_sketch",
      exprs => HllSketchAgg(exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Int] else HllSketch.DefaultPrecision),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_hll_union",
      exprs => HllUnionAgg(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_hll_estimate",
      exprs => HllEstimateExpr(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_theta_sketch",
      exprs => ThetaSketchAgg(exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Int] else ThetaSketch.DefaultK),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_theta_union",
      exprs => ThetaUnionAgg(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_theta_estimate",
      exprs => ThetaEstimateExpr(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_theta_intersect",
      exprs => ThetaIntersectExpr(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_quantile_sketch",
      exprs => QuantileSketchAgg(exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Int] else QuantileSketch.DefaultK),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_quantile_union",
      exprs => QuantileUnionAgg(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_quantile_estimate",
      exprs => QuantileEstimateExpr(exprs(0),
        exprs(1).eval() match { case d: org.apache.spark.sql.types.Decimal => d.toDouble; case d: Double => d; case other => other.toString.toDouble }),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_freq_items",
      exprs => FreqSketchAgg(exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Int] else FreqSketch.DefaultK),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_bloom_sketch",
      exprs => BloomSketchAgg(exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Int] else BloomSketch.DefaultBits,
        if (exprs.length > 2) exprs(2).eval().asInstanceOf[Int] else BloomSketch.DefaultHashes),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_bloom_union",
      exprs => BloomUnionAgg(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomContainsExpr(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_cms_sketch",
      exprs => CmsSketchAgg(exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Int] else CmsSketch.DefaultDepth,
        if (exprs.length > 2) exprs(2).eval().asInstanceOf[Int] else CmsSketch.DefaultWidth),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_cms_union",
      exprs => CmsUnionAgg(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_top_k",
      exprs => TopKAggExpr(exprs(0), exprs(1),
        if (exprs.length > 2) exprs(2).eval().asInstanceOf[Int] else TopKAgg.DefaultK),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_cms_query",
      exprs => CmsQueryExpr(exprs(0), exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_repetition_stats",
      exprs => RepetitionStatsExpr(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_char_entropy",
      exprs => CharEntropyExpr(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_canonical_text",
      exprs => CanonicalTextExpr(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_span_hashes",
      exprs => SpanHashesExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int]),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_deflate_ratio",
      exprs => DeflateRatioExpr(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_term_counts",
      exprs => TermCountsExpr(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_quality_stats",
      exprs => QualityScoreExpr(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_wordpiece_count",
      exprs => WordpieceCountExpr(exprs.head, evalVocab(exprs(1))),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_wordpiece_tokens",
      exprs => WordpieceTokensExpr(exprs.head, evalVocab(exprs(1))),
      "built-in")
  }

  /** Evaluate a foldable array('a', 'b', ...) vocabulary argument. */
  private def evalVocab(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[String] =
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
}
