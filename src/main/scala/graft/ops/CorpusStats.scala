package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-distribution drift statistics — the mixture-monitoring
  * pass of a training-data pipeline: how far does each source's
  * unigram distribution sit from the corpus-wide distribution
  * (KL(source ∥ corpus)), and how concentrated is each source
  * (unigram Shannon entropy)? Sources that drift far are candidates
  * for re-weighting; entropy collapse flags template/boilerplate
  * farms before they dominate a mixture.
  *
  * Scale shape: one tokenize pass feeds two partial-aggregated
  * count shuffles — (source, token) and per-source totals; the
  * corpus-wide distribution is derived from the (source, token)
  * counts by a second partial agg on token (no re-scan). Every
  * exchanged row is (fixed-width key, count). Per-term KL/entropy
  * contributions are quantized to integer micro-nats before the
  * per-source sum, so results are aggregation-order independent
  * (see NgramLm for the same device).
  */
object CorpusStats {

  /** Per-source drift row: (source, n_distinct_terms, n_tokens,
    * entropy, kl_vs_corpus) — entropy and KL in nats, rounded 4dp,
    * both exact integer-micro-nat sums underneath.
    */
  def sourceDrift(df: DataFrame, source: Column, text: Column): DataFrame = {
    // persisted once: totals, corpus (and grand through it) and the
    // contrib join all consume this table — without the cache the
    // token explode + count shuffle re-ran once per branch (the same
    // defect DomainReweight.step fixed in r13; size is bounded by
    // |vocab|·|sources| fixed-width rows)
    val st = df
      .select(source.cast("string").as("source"),
        explode(split(trim(lower(text)), "\\s+")).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .sharedPersist()

    val totals = st.groupBy(col("source")).agg(sum(col("c")).as("ts"))
    val corpus = st.groupBy(col("w")).agg(sum(col("c")).as("cw"))
    val grand = corpus.agg(sum(col("cw")).as("t"))

    val p = col("c").cast("double") / col("ts")
    val q = col("cw").cast("double") / col("t")
    val contrib = st
      .join(totals, Seq("source"))
      .join(corpus, Seq("w"))
      .crossJoin(broadcast(grand))
      .select(col("source"), col("c"),
        floor(p * log(p / q) * 1e6).cast("bigint").as("kl_micro"),
        floor(-p * log(p) * 1e6).cast("bigint").as("ent_micro"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct_terms"),
        sum(col("c")).as("n_tokens"),
        sum(col("ent_micro")).as("ent_sum"),
        sum(col("kl_micro")).as("kl_sum"))

    contrib.select(col("source"),
      col("n_distinct_terms"), col("n_tokens"),
      round(col("ent_sum").cast("double") / 1e6, 4).as("entropy"),
      round(col("kl_sum").cast("double") / 1e6, 4).as("kl_vs_corpus"))
  }

  /** Population stability index between two binned score
    * distributions (C119) — the model-monitoring standard for "has
    * the scored population shifted since calibration": PSI < 0.1 is
    * stable, > 0.25 triggers recalibration. The symmetric companion
    * to [[sourceDrift]]'s KL (PSI = KL(p∥q) + KL(q∥p) over the
    * bins).
    *
    * Per-bin contribution (p−q)·ln(p/q) is always >= 0 and is
    * quantized to integer micro-nats BEFORE the sum (the KL device
    * above), so the total is aggregation-order independent. Bins
    * absent on one side are Laplace-smoothed (+1 on every observed
    * bin, documented and mirrored in the twin) — the standard way a
    * PSI survives an empty bin without an epsilon hack.
    *
    * One partial-agg groupBy per side over the caller's bin key;
    * the joined bin table is |bins|-sized.
    *
    * @return per bin: (bin, n_ref, n_cur, psi_micro) plus the total
    *         riding in every row would be redundant — sum
    *         psi_micro / 1e6 for the headline number
    */
  def psi(ref: DataFrame, cur: DataFrame): DataFrame = {
    val r = ref.select(col("bin").cast("bigint").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_ref"))
    val c = cur.select(col("bin").cast("bigint").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_cur"))
    val bins = r.join(c, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    psiFromCounts(bins)
  }

  /** [[psi]]'s arithmetic over PRE-AGGREGATED per-bin counts
    * (bin, n_ref, n_cur) — the form a streaming monitor holds as
    * durable state (B17's drift-refit trigger accumulates counts
    * across micro-batches and re-derives the PSI per batch).
    */
  def psiFromCounts(bins: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val tot = bins
      .withColumn("t_ref", sum(col("n_ref")).over(wAll))
      .withColumn("t_cur", sum(col("n_cur")).over(wAll))
      .withColumn("b", count(lit(1)).over(wAll))
    val p = (col("n_ref") + 1).cast("double") / (col("t_ref") + col("b"))
    val q = (col("n_cur") + 1).cast("double") / (col("t_cur") + col("b"))
    tot.select(col("bin"), col("n_ref"), col("n_cur"),
      floor((p - q) * log(p / q) * 1e6).cast("bigint").as("psi_micro"))
  }

  /** DuckDB twin of [[psi]] over CTEs `refb(bin)` / `curb(bin)`;
    * emits the WITH tail + final SELECT.
    */
  def psiSqlTail: String =
    """r AS (SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_ref FROM refb GROUP BY 1),
      |c AS (SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_cur FROM curb GROUP BY 1),
      |bins AS (SELECT coalesce(r.bin, c.bin) AS bin,
      |           CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
      |           CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
      |         FROM r FULL OUTER JOIN c ON r.bin = c.bin),
      |tot AS (SELECT bin, n_ref, n_cur,
      |          CAST(sum(n_ref) OVER () AS BIGINT) AS t_ref,
      |          CAST(sum(n_cur) OVER () AS BIGINT) AS t_cur,
      |          CAST(count(*) OVER () AS BIGINT) AS b
      |        FROM bins)
      |SELECT bin, n_ref, n_cur,
      |  CAST(floor(((CAST(n_ref + 1 AS DOUBLE) / (t_ref + b))
      |        - (CAST(n_cur + 1 AS DOUBLE) / (t_cur + b)))
      |    * ln((CAST(n_ref + 1 AS DOUBLE) / (t_ref + b))
      |        / (CAST(n_cur + 1 AS DOUBLE) / (t_cur + b))) * 1e6) AS BIGINT)
      |    AS psi_micro
      |FROM tot ORDER BY bin""".stripMargin

  /** DuckDB twin of [[sourceDrift]] over `table(source, text)`;
    * final relation is `drift`.
    */
  def sourceDriftSql(table: String): String =
    s"""stok AS (SELECT CAST(source AS VARCHAR) AS source,
       |                string_split_regex(trim(lower(text)), '\\s+') AS toks
       |         FROM $table),
       |st AS (SELECT source, u.w AS w, count(*) AS c
       |       FROM stok, unnest(toks) AS u(w) GROUP BY source, u.w),
       |totals AS (SELECT source, sum(c) AS ts FROM st GROUP BY source),
       |corpus AS (SELECT w, sum(c) AS cw FROM st GROUP BY w),
       |grand AS (SELECT sum(cw) AS t FROM corpus),
       |contrib AS (
       |  SELECT st.source, st.c,
       |    CAST(floor((CAST(st.c AS DOUBLE) / totals.ts)
       |      * ln((CAST(st.c AS DOUBLE) / totals.ts) / (CAST(corpus.cw AS DOUBLE) / grand.t))
       |      * 1e6) AS BIGINT) AS kl_micro,
       |    CAST(floor(-(CAST(st.c AS DOUBLE) / totals.ts)
       |      * ln(CAST(st.c AS DOUBLE) / totals.ts) * 1e6) AS BIGINT) AS ent_micro
       |  FROM st JOIN totals USING (source) JOIN corpus USING (w) CROSS JOIN grand),
       |drift AS (
       |  SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_distinct_terms,
       |    CAST(sum(c) AS BIGINT) AS n_tokens,
       |    round(CAST(sum(ent_micro) AS DOUBLE) / 1e6, 4) AS entropy,
       |    round(CAST(sum(kl_micro) AS DOUBLE) / 1e6, 4) AS kl_vs_corpus
       |  FROM contrib GROUP BY source)""".stripMargin
}
