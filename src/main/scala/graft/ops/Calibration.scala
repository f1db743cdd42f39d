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
}
