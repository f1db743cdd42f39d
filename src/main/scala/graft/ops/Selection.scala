package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-ordered corpus selection under a global token budget: the
  * "take the best N tokens" step of corpus assembly — rank documents
  * by a quality score, keep them best-first while the running token
  * total is still under budget. The naive formulation is a global
  * ORDER BY + running sum — a single-partition window that serializes
  * the whole corpus through one task.
  *
  * Scale shape (the C-EquiDepth prefix-sum device, re-keyed for a
  * descending composite order): scores map to ~[[ScoreRanges]] coarse
  * range keys by pure integer arithmetic, monotone in score DESC;
  * per-range token totals prefix-sum in one tiny window; range
  * offsets broadcast back; the within-range running sum is a window
  * PARTITIONED BY range — every stage is either broadcast-sized or
  * range-parallel, nothing funnels through one partition. Coarse keys
  * use halved values (`score DIV 2`) so the span arithmetic cannot
  * wrap even if scores span the full bigint domain (the EquiDepth
  * overflow guard).
  *
  * The greedy rule is the standard one: a document is kept iff the
  * token total BEFORE it (in (score DESC, id ASC) order) is still
  * under the budget — so the selection always crosses the budget by
  * at most one document and never re-orders on size.
  */
object Selection {

  /** Coarse score-range count for the distributed prefix sum. */
  final val ScoreRanges = 256

  /** Select documents best-score-first under a global token budget.
    *
    * @param df     one row per document
    * @param id     document id (bigint; ascending tiebreak)
    * @param score  integer quality score (bigint; higher = better)
    * @param tokens per-document token count (bigint)
    * @return kept rows as (doc_id, score, n_tokens, cum_before) where
    *         cum_before is the exact token total of all
    *         better-ranked documents
    */
  def tokenBudget(df: DataFrame, id: Column, score: Column, tokens: Column,
      budget: Long): DataFrame = {
    require(budget >= 0)
    // persisted: the min/max scalar, the range-offset agg and the
    // final prefix all read these rows — unpersisted, the upstream
    // scoring kernels re-evaluate three times; the cached relation is
    // three fixed-width columns
    val rows = df.select(id.cast("bigint").as("doc_id"),
      score.cast("bigint").as("score"), tokens.cast("bigint").as("n_tokens"))
      .sharedPersist()
    val mm = rows.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    // descending: the BEST scores get the LOWEST coarse key, so the
    // range prefix order equals the selection order
    val ranged = rows.crossJoin(broadcast(mm))
      .withColumn("halfstep", expr(s"(hi DIV 2 - lo DIV 2) DIV $ScoreRanges + 1"))
      .withColumn("coarse", expr("(hi DIV 2 - score DIV 2) DIV halfstep"))

    val wOff = Window.orderBy(col("coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("coarse")).agg(sum(col("n_tokens")).as("cs"))
      .withColumn("offset", coalesce(sum(col("cs")).over(wOff), lit(0L)))
      .select(col("coarse"), col("offset"))

    // equal scores share a coarse key (it is a function of the score
    // alone), so ordering by (score DESC, doc_id) inside each range
    // reproduces the global order exactly
    val wIn = Window.partitionBy(col("coarse"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)

    ranged.join(broadcast(offsets), Seq("coarse"))
      .withColumn("cum_before",
        col("offset") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .filter(col("cum_before") < budget)
      .select(col("doc_id"), col("score"), col("n_tokens"), col("cum_before"))
  }
}
