package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group score calibration: percent_rank of an integer quality
  * score WITHIN its group, so thresholds are comparable across
  * groups. The motivating case is per-language quality filtering —
  * raw quality scores (length, stopword ratios, LM perplexity) are
  * not comparable across languages, so a single global cutoff
  * over-prunes some languages and under-prunes others; the standard
  * fix is to rank-normalize per language and threshold the
  * percentile.
  *
  * The naive formulation — `percent_rank() OVER (PARTITION BY lang
  * ORDER BY score)` — funnels each group through ONE window task; at
  * 100 TB a dominant language is most of the corpus in one partition.
  * This operator re-keys the C-EquiDepth distributed prefix device
  * per group (the [[Selection]] shape): scores map to coarse range
  * keys by pure integer arithmetic (halved values, so the span cannot
  * wrap); per-(group, range) counts prefix-sum in a tiny
  * broadcast-sized window; the within-range rank is a window
  * PARTITIONED BY (group, range). Every stage is range-parallel or
  * KB-sized; no group ever serializes through one task.
  */
object Calibration {

  /** Coarse score-range count for the distributed prefix sum. */
  final val ScoreRanges = 256

  /** Percent-rank of `score` within `group`, ascending, with
    * ascending-id tiebreak (a total order, so rank == row_number and
    * the result is deterministic). pct = rank0 / (n - 1) exactly as
    * SQL `percent_rank()`; single-row groups get 0.0.
    *
    * @return (id, group, score, pct)
    */
  def rankNormalize(df: DataFrame, id: Column, group: Column, score: Column): DataFrame = {
    // persisted: the min/max scalar, the per-range counts and the
    // final ranked read all re-evaluate the upstream scoring kernels
    // otherwise; three fixed-width columns cached
    val rows = df.select(id.cast("bigint").as("doc_id"), group.as("grp"),
      score.cast("bigint").as("score"))
      .sharedPersist()
    val mm = rows.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    val ranged = rows.crossJoin(broadcast(mm))
      .withColumn("halfstep", expr(s"(hi DIV 2 - lo DIV 2) DIV $ScoreRanges + 1"))
      .withColumn("coarse", expr("(score DIV 2 - lo DIV 2) DIV halfstep"))

    // per-(group, range) counts: partial-agg shuffle of at most
    // groups x ScoreRanges rows; the prefix window partitions by
    // group over <= ScoreRanges rows each
    val wOff = Window.partitionBy(col("grp")).orderBy(col("coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val counts = ranged.groupBy(col("grp"), col("coarse")).agg(count(lit(1)).as("c"))
    val offsets = counts
      .withColumn("offset", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select(col("grp"), col("coarse"), col("offset"))
    val totals = counts.groupBy(col("grp")).agg(sum(col("c")).as("n"))

    // equal scores share a coarse key (a function of the score
    // alone), so (score, id) inside each range reproduces the global
    // per-group order exactly
    val wIn = Window.partitionBy(col("grp"), col("coarse"))
      .orderBy(col("score"), col("doc_id"))
    ranged.join(broadcast(offsets), Seq("grp", "coarse"))
      .join(broadcast(totals), Seq("grp"))
      .withColumn("rank0", col("offset") + row_number().over(wIn) - 1)
      .select(col("doc_id"), col("grp"), col("score"),
        when(col("n") === 1, lit(0.0))
          .otherwise(col("rank0").cast("double") / (col("n") - 1).cast("double"))
          .as("pct"))
  }

  /** C141 histogram-binning calibration audit (Zadrozny & Elkan
    * 2001's binning calibrator, run as an audit): learn the per-bin
    * empirical positive rate on a deterministic hash-split
    * calibration slice, evaluate it on the held-out slice, and report
    * the reliability table plus the weighted expected calibration
    * error. Everything is integer-exact (milli rates by floor
    * division) — no sigmoid enters, so the audit is engine-portable
    * and reproducible: a margin bin whose calibration-slice rate and
    * test-slice rate disagree is exactly where the classifier's
    * scores cannot be trusted as probabilities.
    *
    * Scale shape: one narrow pass computes (bin, split, pos), two
    * (bin)-keyed partial aggs, a full-outer join over the BOUNDED bin
    * table (≤ margin-range/binWidth rows — an agg output, never the
    * corpus), and the scalar ECE joins back as a 1-row broadcast.
    *
    * @param scored rows carrying a key, an integer margin, and a
    *               ±1 gold label
    * @return (bin, n_cal, p_cal_milli, n_test, p_test_milli,
    *         gap_milli, ece_milli) ordered by bin; rate columns are
    *         NULL for a slice with no rows in the bin, gap/ECE only
    *         count bins covered by BOTH slices
    */
  def binnedReliability(
      scored: DataFrame,
      key: Column,
      margin: Column,
      label: Column,
      calFraction: Double = 0.8,
      binWidth: Int = 256): DataFrame = {
    val thr = (BigDecimal(calFraction) * BigDecimal(Sampling.HashSpace)).toLong
    val base = scored
      .select(
        margin.cast("bigint").as("margin"),
        when(label > 0, 1L).otherwise(0L).as("pos"),
        (Dedup.md5Hash60(key.cast("string")) < lit(thr)).as("is_cal"))
      .withColumn("bin", floor(col("margin") / lit(binWidth.toDouble)).cast("bigint"))
      .sharedPersist()
    val cb = base.filter(col("is_cal")).groupBy(col("bin"))
      .agg(count(lit(1)).as("n_cal"), sum(col("pos")).as("pos_cal"))
    val tb = base.filter(!col("is_cal")).groupBy(col("bin"))
      .agg(count(lit(1)).as("n_test"), sum(col("pos")).as("pos_test"))
    val j = cb.join(tb, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_cal"), lit(0L)).as("n_cal"),
        when(col("n_cal") > 0, expr("CAST((1000 * pos_cal) DIV n_cal AS BIGINT)"))
          .as("p_cal_milli"),
        coalesce(col("n_test"), lit(0L)).as("n_test"),
        when(col("n_test") > 0, expr("CAST((1000 * pos_test) DIV n_test AS BIGINT)"))
          .as("p_test_milli"))
      .withColumn("gap_milli",
        when(col("p_cal_milli").isNotNull && col("p_test_milli").isNotNull,
          abs(col("p_test_milli") - col("p_cal_milli"))))
      .sharedPersist()
    val ece = j.agg(
        sum(when(col("gap_milli").isNotNull, col("n_test")).otherwise(lit(0L))).as("cov"),
        sum(when(col("gap_milli").isNotNull, col("n_test") * col("gap_milli"))
          .otherwise(lit(0L))).as("wg"))
      .select(when(col("cov") > 0, expr("CAST(wg DIV cov AS BIGINT)")).as("ece_milli"))
    j.crossJoin(broadcast(ece)).orderBy(col("bin"))
  }

  /** DuckDB CTE tail for [[binnedReliability]] — expects a
    * `fsc(doc_id, margin, y)` relation in scope; produces `relg`
    * (the reliability rows) and `ece` (the 1-row scalar).
    */
  def binnedReliabilitySqlTail(calFraction: Double = 0.8, binWidth: Int = 256): String = {
    val thr = (BigDecimal(calFraction) * BigDecimal(Sampling.HashSpace)).toLong
    s"""calb AS (SELECT margin, CASE WHEN y = 1 THEN 1 ELSE 0 END AS pos,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT < $thr AS is_cal,
       |    CAST(floor(margin / ${binWidth}.0) AS BIGINT) AS bin
       |  FROM fsc),
       |cb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_cal,
       |         CAST(sum(pos) AS BIGINT) AS pos_cal
       |       FROM calb WHERE is_cal GROUP BY bin),
       |tb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_test,
       |         CAST(sum(pos) AS BIGINT) AS pos_test
       |       FROM calb WHERE NOT is_cal GROUP BY bin),
       |relj AS (SELECT coalesce(cb.bin, tb.bin) AS bin,
       |    coalesce(n_cal, 0) AS n_cal,
       |    CASE WHEN n_cal > 0 THEN (1000 * pos_cal) // n_cal END AS p_cal_milli,
       |    coalesce(n_test, 0) AS n_test,
       |    CASE WHEN n_test > 0 THEN (1000 * pos_test) // n_test END AS p_test_milli
       |  FROM cb FULL JOIN tb ON cb.bin = tb.bin),
       |relg AS (SELECT bin, n_cal, p_cal_milli, n_test, p_test_milli,
       |    CASE WHEN p_cal_milli IS NOT NULL AND p_test_milli IS NOT NULL
       |         THEN abs(p_test_milli - p_cal_milli) END AS gap_milli
       |  FROM relj),
       |ece AS (SELECT CASE
       |    WHEN sum(CASE WHEN gap_milli IS NOT NULL THEN n_test ELSE 0 END) > 0
       |    THEN CAST(sum(CASE WHEN gap_milli IS NOT NULL THEN n_test * gap_milli ELSE 0 END)
       |         // sum(CASE WHEN gap_milli IS NOT NULL THEN n_test ELSE 0 END) AS BIGINT)
       |    END AS ece_milli
       |  FROM relg)""".stripMargin
  }
}
