package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing: score every document with the
  * Kneser–Ney bigram LM (C86) and split each language into
  * head / middle / tail thirds by score — the curation scheme behind
  * CCNet (Wenzek et al. 2020), where the "head" (lowest-perplexity)
  * third feeds training and the tail is dropped or down-weighted.
  *
  * The bucket is an exact per-group NTILE — but computed WITHOUT a
  * per-row `PARTITION BY lang ORDER BY score` window (at 100 TB one
  * language is most of the corpus: a per-row window is a single-task
  * sort). Instead the A40 distinct-value-histogram device extends to
  * ranking: per (lang, score) counts give each row's
  * strictly-below cumulative count from a window over |distinct
  * scores| rows; the tie-break rank among equal scores is a window
  * over the tie group only (bounded by the count of docs sharing an
  * identical 4dp score — orders of magnitude below |rows|); the
  * SQL-standard NTILE then derives from (rank, groupN) in exact
  * integer arithmetic. Engine parity is integer-exact: DuckDB's
  * builtin `ntile(k)` over the same total order produces the
  * identical tiles.
  */
object PerplexityBuckets {

  /** Exact per-group NTILE(k) over the total order (score, id):
    * (id, group, score, tile) with tile in [1, k]. The SQL-standard
    * distribution: the first (n mod k) tiles hold ceil(n/k) rows,
    * the rest floor(n/k).
    */
  def ntileByGroup(df: DataFrame, group: Column, score: Column,
      id: Column, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2 tiles, got $k")
    val base = df.select(group.as("__g"), score.as("__v"), id.as("__i"))
    val hist = base.groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val wBelow = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist.select(col("__g"), col("__v"),
      coalesce(sum(col("__c")).over(wBelow), lit(0L)).as("__below"),
      sum(col("__c")).over(wAll).as("__n"))
    // tie-break among equal scores only — the one per-row window, its
    // partitions bounded by per-score tie-group size, never |group|
    val wTie = Window.partitionBy(col("__g"), col("__v")).orderBy(col("__i"))
    val ranked = base
      .withColumn("__tr", row_number().over(wTie))
      .join(cum, Seq("__g", "__v"))
      .withColumn("__rank", col("__below") + col("__tr"))
    ranked.select(col("__i").as("id"), col("__g").as("group"),
      col("__v").as("score"), tileExpr(col("__rank"), col("__n"), k).as("tile"))
  }

  // SQL-standard NTILE from (rank, n): r = n mod k tiles of q+1
  // rows lead, the remaining k-r tiles hold q rows. Divisions are
  // double-exact here (ranks < 2^53), floored back to integers.
  private def tileExpr(rank: Column, n: Column, k: Int): Column = {
    val q = floor(n / k).cast("bigint")
    val r = n % k
    val cut = r * (q + 1)
    val tile = when(rank <= cut, floor((rank - 1) / (q + 1)))
      .otherwise(r + floor((rank - cut - 1) / max0(q)))
    tile.cast("bigint") + 1
  }

  /** Ungrouped exact NTILE(k) over the total order (score, id):
    * (id, score, tile). [[ntileByGroup]] with a constant group would
    * put BOTH histogram windows in one partition; this variant runs
    * the strictly-below cumulative through the shared auto-strategy
    * prefix device ([[EquiDepth.cumAutoMulti]] — one small window
    * under the cutoff, two-pass partitioned prefix above) and rides
    * the total as a one-row broadcast, so nothing is global even on
    * a near-distinct score domain (the C118 lift-table case at 100×).
    */
  def ntileGlobal(df: DataFrame, score: Column, id: Column, k: Int,
      distinctCutoff: Long = EquiDepth.AutoDistinctCutoff,
      forcePartitioned: Boolean = false): DataFrame = {
    require(k >= 2, s"need k >= 2 tiles, got $k")
    val base = df.select(score.as("__v"), id.as("__i"))
    val hist = base.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val totals = hist.agg(sum(col("__c")).as("__n"))
    val cum = EquiDepth
      .cumAutoMulti(hist.withColumnRenamed("__v", "v"), Seq("__c"),
        asc = true, distinctCutoff, forcePartitioned)
      .select(col("v").as("__v"), col("cum_before___c").as("__below"))
    val wTie = Window.partitionBy(col("__v")).orderBy(col("__i"))
    val ranked = base
      .withColumn("__tr", row_number().over(wTie))
      .join(cum, Seq("__v"))
      .crossJoin(broadcast(totals))
      .withColumn("__rank", col("__below") + col("__tr"))
    ranked.select(col("__i").as("id"), col("__v").as("score"),
      tileExpr(col("__rank"), col("__n"), k).as("tile"))
  }

  // guards the n < k case (q = 0): those rows all sit below `cut`,
  // the otherwise-branch is never taken, but non-ANSI division still
  // evaluates — keep it defined
  private def max0(c: Column): Column = greatest(c, lit(1L))

  /** (doc_id, lang, n_bigrams, avg_logprob, ppl_bucket) — KN-scored
    * docs split per language into 'tail' / 'middle' / 'head' thirds
    * (ascending avg log-probability: the lowest-scoring third — the
    * highest perplexity — is the tail, exactly CCNet's orientation).
    */
  def bucketize(df: DataFrame, id: Column, text: Column, lang: Column,
      discount: Double = 0.75): DataFrame = {
    val scored = NgramLm.kneserNeyScore(df, id, text, discount)
    // consumed twice (the tile derivation and the final join) —
    // persisted so the whole KN scoring pipeline runs once
    val withLang = scored.join(
        df.select(id.cast("bigint").as("doc_id"), lang.as("lang")), Seq("doc_id"))
      .sharedPersist()
    val tiles = ntileByGroup(withLang, col("lang"), col("avg_logprob"),
      col("doc_id"), k = 3)
    withLang.join(
        tiles.select(col("id").as("doc_id"), col("tile")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("avg_logprob"),
        when(col("tile") === 1, "tail").when(col("tile") === 2, "middle")
          .otherwise("head").as("ppl_bucket"))
  }

  /** DuckDB twin of [[bucketize]] over `table(doc_id, lang, text)`;
    * final relation `pplb(doc_id, lang, n_bigrams, avg_logprob,
    * ppl_bucket)`. The builtin window NTILE over the same (score,
    * doc_id) total order is the histogram-device equivalence being
    * proven.
    */
  def bucketizeSql(table: String, discount: Double = 0.75): String =
    s"""${NgramLm.kneserNeyScoreSql(table, discount)},
       |ppll AS (SELECT k.doc_id, d.lang, k.n_bigrams, k.avg_logprob,
       |           ntile(3) OVER (PARTITION BY d.lang
       |             ORDER BY k.avg_logprob, k.doc_id) AS tile
       |         FROM knsc k JOIN $table d USING (doc_id)),
       |pplb AS (SELECT doc_id, lang, n_bigrams, avg_logprob,
       |           CASE tile WHEN 1 THEN 'tail' WHEN 2 THEN 'middle'
       |             ELSE 'head' END AS ppl_bucket
       |         FROM ppll)""".stripMargin
}
