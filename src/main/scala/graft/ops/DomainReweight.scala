package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DoReMi-style domain mixture reweighting (Xie et al. 2023, one
  * exponentiated-gradient step): domains where the model does WORSE
  * than the corpus baseline get up-weighted —
  * `w_i ∝ w0_i · exp(η · excess_loss_i)`, normalized. Here the loss
  * proxy is the per-source unigram cross-entropy under the corpus
  * distribution (the C42 drift family: sources the corpus model
  * predicts poorly carry information the mixture under-serves), so
  * the step is self-contained — plug in real per-domain LM losses by
  * replacing the loss stage.
  *
  * Exactness: per-term cross-entropy contributions floor to integer
  * micro-nats (the C42 device); the boost `exp(η·excess)` floors to
  * integer micro-units off a double whose inputs are exact integers
  * (single correctly-rounded exp on both engines); numerators
  * `w0 · boost` are exact DECIMAL(38,0) products; the final ppm
  * weights derive from one double division of identically-rounded
  * decimals — engine-portable end to end.
  *
  * Scale shape: one (source, term) partial-agg count shuffle over the
  * token stream; vocabulary-sized joins for the corpus distribution;
  * everything after runs on |sources| rows (broadcast scalars for the
  * min-loss and the normalizer).
  */
object DomainReweight {

  /** (source, n_tokens, ce_micro, boost_micro, weight_ppm): one EG
    * step over the per-source cross-entropy, `etaMilli` = η in
    * milli-units (100 = 0.1). `weight_ppm` sums to <= 1e6 (floor
    * rounding); w0 is the source's token share (the natural
    * baseline mixture).
    */
  def step(df: DataFrame, source: Column, text: Column,
      etaMilli: Long): DataFrame = {
    require(etaMilli > 0, s"need a positive milli-eta, got $etaMilli")
    import graft.util.PlanCache.Shareable
    // The (source, term) count table feeds FIVE downstream branches
    // (totals, corpus, grand, the ce join, and — transitively — the
    // min-ce and normalizer scalars): persist it once so the
    // token-explode scan + count shuffle run a single time instead of
    // once per scalar-broadcast round (the r12 plan re-ran the
    // explode ~5x and q_domain_reweight carried 7 BNLJ rounds each
    // re-deriving it). Size is per-source vocabulary — bounded by
    // |vocab|·|sources| fixed-width rows, cache-safe at any corpus
    // scale.
    val st = df
      .select(source.cast("string").as("source"),
        explode(split(trim(lower(text)), "\\s+")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .sharedPersist()
    val totals = st.groupBy(col("source")).agg(sum(col("c")).as("ts"))
    val corpus = st.groupBy(col("w")).agg(sum(col("c")).as("cw"))
    val grand = corpus.agg(sum(col("cw")).as("t"))

    // H(p_i, q) = -Σ_w p_i(w) ln q(w), per-term floored micro-nats
    val p = col("c").cast("double") / col("ts")
    val q = col("cw").cast("double") / col("t")
    val ce = st
      .join(totals, Seq("source"))
      .join(corpus, Seq("w"))
      .crossJoin(broadcast(grand))
      .select(col("source"), col("ts"),
        floor(-p * log(q) * 1e6).cast("bigint").as("ce_term"))
      .groupBy(col("source"))
      .agg(first(col("ts")).as("n_tokens"), sum(col("ce_term")).as("ce_micro"))
      // |sources| rows: the min-ce scalar and the boost projection
      // both consume it — cache so the vocab join above runs once
      .sharedPersist()

    // min-ce and the normalizer ride as windows over the SAME bounded
    // per-source frame (ce is one row per mixture domain — DoReMi
    // mixtures are tens of domains, never corpus-scale) instead of two
    // scalar-broadcast rounds: the r12 plan carried 7 BNLJ rounds, the
    // r13-build persist cut it to 2 broadcast jobs, this removes those
    // too. Integer/decimal min+sum are associative, so the window
    // arithmetic is bit-identical to the agg form. q_domain_reweight
    // joins PlanShape.BoundedWindowQueries with that bound.
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val boosted = ce.withColumn("min_ce", min(col("ce_micro")).over(wAll))
      .select(col("source"), col("n_tokens"), col("ce_micro"),
        floor(exp(lit(etaMilli.toDouble) * (col("ce_micro") - col("min_ce"))
          / lit(1e9)) * 1e6).cast("bigint").as("boost_micro"))
      .withColumn("w_num",
        (col("n_tokens").cast("decimal(19,0)") *
          col("boost_micro").cast("decimal(19,0)")).cast("decimal(38,0)"))
    boosted
      .withColumn("w_den", sum(col("w_num")).over(wAll).cast("decimal(38,0)"))
      .select(col("source"), col("n_tokens"), col("ce_micro"), col("boost_micro"),
        floor(lit(1e6) * col("w_num").cast("double") / col("w_den").cast("double"))
          .cast("bigint").as("weight_ppm"))
  }

  /** DuckDB twin of [[step]] over `table(source, text)`; final
    * relation `drw(source, n_tokens, ce_micro, boost_micro,
    * weight_ppm)`.
    */
  def stepSql(table: String, etaMilli: Long): String =
    s"""dwt AS (SELECT CAST(source AS VARCHAR) AS source, u.w AS w
       |        FROM $table, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(w)),
       |dws AS (SELECT source, w, count(*) AS c FROM dwt GROUP BY source, w),
       |dwtot AS (SELECT source, sum(c) AS ts FROM dws GROUP BY source),
       |dwcorp AS (SELECT w, sum(c) AS cw FROM dws GROUP BY w),
       |dwg AS (SELECT sum(cw) AS t FROM dwcorp),
       |dwce AS (
       |  SELECT s.source, CAST(max(tt.ts) AS BIGINT) AS n_tokens,
       |    CAST(sum(CAST(floor(-(CAST(s.c AS DOUBLE) / tt.ts)
       |      * ln(CAST(c2.cw AS DOUBLE) / g.t) * 1e6) AS BIGINT)) AS BIGINT) AS ce_micro
       |  FROM dws s JOIN dwtot tt USING (source)
       |  JOIN dwcorp c2 USING (w) CROSS JOIN dwg g
       |  GROUP BY s.source),
       |dwmin AS (SELECT min(ce_micro) AS min_ce FROM dwce),
       |dwb AS (
       |  SELECT source, n_tokens, ce_micro,
       |    CAST(floor(exp($etaMilli * (ce_micro - m.min_ce) / 1e9) * 1e6) AS BIGINT)
       |      AS boost_micro
       |  FROM dwce CROSS JOIN dwmin m),
       |dwn AS (SELECT *,
       |          CAST(CAST(n_tokens AS HUGEINT) * boost_micro AS DECIMAL(38,0)) AS w_num
       |        FROM dwb),
       |dwd AS (SELECT CAST(sum(w_num) AS DECIMAL(38,0)) AS w_den FROM dwn),
       |drw AS (
       |  SELECT source, n_tokens, ce_micro, boost_micro,
       |    CAST(floor(1e6 * CAST(w_num AS DOUBLE) / CAST(w_den AS DOUBLE)) AS BIGINT)
       |      AS weight_ppm
       |  FROM dwn CROSS JOIN dwd)""".stripMargin
}
