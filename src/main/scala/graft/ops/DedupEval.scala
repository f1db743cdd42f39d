package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dedup-quality evaluation — measuring the near-dup pipeline
  * instead of trusting it: LSH banding is a recall/precision
  * trade-off (the S-curve picks which Jaccard range surfaces as
  * candidates), and at corpus scale you tune (bins, bands) against
  * MEASURED candidate recall on your own data, not against the
  * textbook curve. This operator computes, against a ground-truth
  * pair set (exact blocked n-gram Jaccard, C4's device):
  *
  *   - n_true       true pairs (jaccard >= threshold within blocks)
  *   - n_cand       banding candidate pairs (pre-verify)
  *   - n_cand_true  candidates that are true pairs
  *   - recall_milli     floor(1000 * n_cand_true / n_true)
  *   - precision_milli  floor(1000 * n_cand_true / n_cand)
  *
  * Scale shape: both pair sets are the C2/C85 fixed-width shuffle
  * pipelines; the intersection is one join on (id_a, id_b) pairs;
  * the counts collapse to three one-row aggregates combined by
  * one-row broadcasts. At 100 TB this runs on a SAMPLE of the corpus
  * (any blocked subset) — the metric, not the dedup itself.
  */
object DedupEval {

  /** One row: (n_true, n_cand, n_cand_true, recall_milli,
    * precision_milli) for OPH-MinHash banding (C85) measured against
    * the blocked exact-Jaccard ground truth. Milli ratios are null
    * when the denominator is 0.
    */
  def ophCandidateMetrics(df: DataFrame, id: Column, text: Column,
      blockBy: Column, shingleK: Int = 3, numBins: Int = 16,
      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val truth = Dedup.ngramJaccard(df, id, text, blockBy, shingleK, threshold)
      .select(col("id_a"), col("id_b"))
    val cand = Dedup.ophCandidates(df, id, text, shingleK, numBins, bands)
    val hit = cand.join(truth, Seq("id_a", "id_b"), "left_semi")
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val nCand = cand.agg(count(lit(1)).as("n_cand"))
    val nHit = hit.agg(count(lit(1)).as("n_cand_true"))
    nTrue.crossJoin(broadcast(nCand)).crossJoin(broadcast(nHit))
      .select(col("n_true"), col("n_cand"), col("n_cand_true"),
        when(col("n_true") > 0,
          floor(lit(1000.0) * col("n_cand_true") / col("n_true")).cast("bigint"))
          .as("recall_milli"),
        when(col("n_cand") > 0,
          floor(lit(1000.0) * col("n_cand_true") / col("n_cand")).cast("bigint"))
          .as("precision_milli"))
  }

  /** DuckDB twin fragment: expects CTEs `prs(id_a, id_b)` (the
    * blocked exact ground truth) and `cand(id_a, id_b)` (the banding
    * candidates) in scope; final relation `deval`.
    */
  def metricsSql: String =
    """dhit AS (SELECT c.id_a, c.id_b FROM cand c
      |         WHERE EXISTS (SELECT 1 FROM prs p
      |                       WHERE p.id_a = c.id_a AND p.id_b = c.id_b)),
      |deval AS (
      |  SELECT
      |    (SELECT count(*) FROM prs) AS n_true,
      |    (SELECT count(*) FROM cand) AS n_cand,
      |    (SELECT count(*) FROM dhit) AS n_cand_true,
      |    CASE WHEN (SELECT count(*) FROM prs) > 0 THEN
      |      CAST(floor(1000.0 * (SELECT count(*) FROM dhit)
      |        / (SELECT count(*) FROM prs)) AS BIGINT) END AS recall_milli,
      |    CASE WHEN (SELECT count(*) FROM cand) > 0 THEN
      |      CAST(floor(1000.0 * (SELECT count(*) FROM dhit)
      |        / (SELECT count(*) FROM cand)) AS BIGINT) END AS precision_milli)""".stripMargin
}
