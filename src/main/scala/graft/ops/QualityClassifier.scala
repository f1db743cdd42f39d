package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed linear quality classifier — the fastText-style document
  * scorer used to gate web corpora ("does this look like reference
  * text?"): bag of hashed unigram+bigram features, a linear weight
  * per feature bucket, score = mean feature weight, keep = score>0.
  *
  * Real pipelines learn the weight table offline and broadcast it;
  * here the table is a deterministic function of the bucket id (a
  * portable md5-derived integer in [-1000, 1000] milli-units), which
  * keeps the operator's *shape* identical to the production one —
  * explode features, map to (bucket, weight), aggregate per doc —
  * while making every output integer-exact and DuckDB-oracle-able.
  * Swapping in learned weights is a broadcast-join (or a literal
  * `element_at` over a weights array) on the same bucket column.
  *
  * Scale shape: tokenize + feature-hash is a narrow map (the weight
  * is computed from the bucket id — no join, no dictionary state);
  * the ONLY shuffle keys per-doc partial sums of (count, milli
  * weight) — fixed-width integers, never tokens. At 100 TB this is
  * one pass over the corpus and one partial-aggregated exchange of
  * two longs per document.
  */
object QualityClassifier {

  /** Feature-hash buckets (power of two, but modulo is portable math
    * either way).
    */
  final val Buckets = 1024

  /** Per-bucket deterministic weight in milli-units: an integer in
    * [-1000, 1000] derived from md5("qw:" ++ bucket). Matches
    * [[weightMilliSql]] bit for bit.
    */
  private[ops] def weightMilli(bucket: Column): Column =
    pmod(Dedup.md5Hash60(concat(lit("qw:"), bucket.cast("string"))), lit(2001L)) - lit(1000L)

  private[ops] def weightMilliSql(bucketExpr: String): String =
    s"(('0x' || substr(md5('qw:' || CAST($bucketExpr AS VARCHAR)), 1, 15))::BIGINT % 2001) - 1000"

  /** Score each document: (doc_id, n_features, logit_milli, score,
    * keep) where n_features counts unigrams+bigrams, logit_milli is
    * the exact integer sum of per-feature milli-weights, score is
    * the mean feature weight in [-1, 1] rounded to 4dp, and keep is
    * the score > 0 gate.
    *
    * Hot path: the single-pass [[graft.plans.QualityScoreExpr]]
    * kernel — a pure narrow map, zero shuffle (the composed
    * explode+agg path below exchanges 2×tokens rows per doc and is
    * retained as the spec-verified semantic baseline).
    */
  def score(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.cast("bigint").as("doc_id"),
        graft.plans.QualityScoreExpr.qualityStats(text).as("qs"))
      .select(col("doc_id"),
        coalesce(col("qs.n_features"), lit(0L)).as("n_features"),
        coalesce(col("qs.logit_milli"), lit(0L)).as("logit_milli"),
        coalesce(
          round(col("qs.logit_milli").cast("double") / (col("qs.n_features") * 1000.0), 4),
          lit(0.0)).as("score"))
      .withColumn("keep", col("logit_milli") > 0)

  /** The composed explode+aggregate formulation — the semantic
    * baseline [[score]]'s kernel is verified against.
    */
  def scoreComposed(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = df.select(id.cast("bigint").as("doc_id"),
      split(trim(lower(text)), "\\s+").as("toks"))

    // Unigram terms ++ "w1 w2" bigram terms, as one combined stream.
    val terms = toks.select(col("doc_id"),
      explode(concat(
        col("toks"),
        zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)))).as("term"))

    val contrib = terms
      .select(col("doc_id"),
        weightMilli(pmod(Dedup.md5Hash60(col("term")), lit(Buckets.toLong))).as("w_milli"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_features"), sum(col("w_milli")).as("logit_milli"))

    toks.select(col("doc_id"))
      .join(contrib, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        coalesce(col("logit_milli"), lit(0L)).as("logit_milli"),
        when(col("n_features").isNotNull,
          round(col("logit_milli").cast("double") / (col("n_features") * 1000.0), 4))
          .otherwise(lit(0.0)).as("score"))
      .withColumn("keep", col("logit_milli") > 0)
  }

  /** DuckDB twin of [[score]] as a CTE chain over `table(doc_id,
    * text)`; final relation is `qscored`.
    */
  def scoreSql(table: String): String = {
    val bucket = s"(('0x' || substr(md5(term), 1, 15))::BIGINT % ${Buckets})"
    s"""qtok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
       |         FROM $table),
       |qterms AS (
       |  SELECT doc_id, u.term FROM qtok, unnest(toks) AS u(term)
       |  UNION ALL
       |  SELECT doc_id, toks[p.i] || ' ' || toks[p.i + 1] AS term
       |  FROM qtok, unnest(range(1, len(toks))) AS p(i)),
       |qcontrib AS (
       |  SELECT doc_id, count(*) AS n_features,
       |    sum(${weightMilliSql(bucket)}) AS logit_milli
       |  FROM qterms GROUP BY doc_id),
       |qscored AS (
       |  SELECT t.doc_id,
       |    CAST(coalesce(c.n_features, 0) AS BIGINT) AS n_features,
       |    CAST(coalesce(c.logit_milli, 0) AS BIGINT) AS logit_milli,
       |    CASE WHEN c.n_features IS NOT NULL
       |      THEN round(CAST(c.logit_milli AS DOUBLE) / (c.n_features * 1000.0), 4)
       |      ELSE 0.0 END AS score,
       |    coalesce(c.logit_milli, 0) > 0 AS keep
       |  FROM qtok t LEFT JOIN qcontrib c USING (doc_id))""".stripMargin
  }
}
