package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Moore–Lewis cross-entropy difference filtering (Moore & Lewis
  * 2010, "Intelligent selection of language model training data") —
  * the canonical "find more text like my seed" selector: fit one
  * bigram LM on an in-domain seed slice and one on the full corpus,
  * score every document by its per-bigram average log-probability
  * difference `H_general − H_in = lp_in − lp_general`, and keep docs
  * the in-domain model likes MORE than the general model does. Docs
  * that merely look like fluent average text score ≈ 0; docs that
  * look like the seed score positive — which is why this beats a raw
  * perplexity gate for domain curation.
  *
  * Both models share one smoothing space so the difference is
  * well-defined on out-of-seed vocabulary: Jelinek–Mercer bigram
  * interpolation with an add-one unigram back-off over the FULL
  * corpus vocabulary V,
  * `p_M(w2|w1) = λ·c_M(w1w2)/c_M(w1) + (1−λ)·(c_M(w2)+1)/(T_M+V)`
  * (the bigram term drops when model M never saw the context — the
  * back-off keeps every probability strictly positive for either
  * model on any token).
  *
  * Determinism contract: per-position log-probs quantize to integer
  * micro-nats before the per-doc sum (the C37 device), and the keep
  * decision compares the two INTEGER sums — never a rounded double —
  * so the gate is aggregation-order- and engine-exact.
  *
  * Scale shape: one shared (doc, w1, w2) stream feeds both fits —
  * four token-keyed partial aggs (unigram/bigram × seed/full), three
  * scalars via 1-row broadcasts, key-joins to attach counts, one
  * doc-keyed rollup. The seed tables are small (a seed is ~1% of the
  * corpus) and AQE broadcasts them; nothing iterates, nothing lands
  * on the driver but the scalars.
  */
object MooreLewis {

  /** Per-doc cross-entropy difference under seed-vs-corpus bigram
    * models: (doc_id, n_bigrams, ml_score, keep) — ml_score =
    * avg lp_in − lp_general in nats rounded 4dp (0.0 for < 2-token
    * docs), keep = integer-sum comparison (false for empty docs).
    *
    * @param inDomain boolean column marking the seed slice
    */
  def score(df: DataFrame, id: Column, text: Column, inDomain: Column,
      lambda: Double = 0.5): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, s"need 0 < lambda < 1, got $lambda")
    val toks = df.select(id.cast("bigint").as("doc_id"),
      inDomain.as("indom"),
      split(trim(lower(text)), "\\s+").as("toks"))

    val stream = toks
      .select(col("doc_id"), col("indom"),
        posexplode(slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))))
          .as(Seq("pos", "w1")),
        col("toks"))
      .select(col("doc_id"), col("indom"), col("w1"),
        element_at(col("toks"), col("pos") + 2).as("w2"))
      .sharedPersist()

    val uniAll = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("ca"))
      .sharedPersist()
    // persisted like uniAll: the scal aggregate and two attach joins
    // all read it — unpersisted, the seed-side explode + count ran
    // three times
    val uniIn = toks.filter(col("indom"))
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("ci"))
      .sharedPersist()
    val biAll = stream.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2a"))
    val biIn = stream.filter(col("indom"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2i"))

    // one 1-row scalar frame: full-corpus token total + vocab size,
    // seed token total
    val scal = uniAll.agg(sum(col("ca")).as("t_all"), count(lit(1)).as("v_all"))
      .crossJoin(uniIn.agg(coalesce(sum(col("ci")), lit(0L)).as("t_in")))

    def lpMicro(bigramTerm: Column, backoff: Column): Column =
      floor(log(bigramTerm + backoff) * 1e6).cast("bigint")

    val contrib = stream
      .join(biAll, Seq("w1", "w2"))
      .join(biIn, Seq("w1", "w2"), "left")
      .join(uniAll.select(col("w").as("w1"), col("ca").as("caw1")), Seq("w1"))
      .join(uniAll.select(col("w").as("w2"), col("ca").as("caw2")), Seq("w2"))
      .join(uniIn.select(col("w").as("w1"), col("ci").as("ciw1")), Seq("w1"), "left")
      .join(uniIn.select(col("w").as("w2"), col("ci").as("ciw2")), Seq("w2"), "left")
      .crossJoin(broadcast(scal))
      .select(col("doc_id"),
        lpMicro(
          lit(lambda) * col("c2a").cast("double") / col("caw1"),
          lit(1.0 - lambda) * (col("caw2") + 1).cast("double") / (col("t_all") + col("v_all")))
          .as("lp_all"),
        lpMicro(
          when(col("c2i").isNotNull && col("ciw1").isNotNull,
            lit(lambda) * col("c2i").cast("double") / col("ciw1")).otherwise(lit(0.0)),
          lit(1.0 - lambda) * (coalesce(col("ciw2"), lit(0L)) + 1).cast("double") /
            (col("t_in") + col("v_all")))
          .as("lp_in"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp_in")).as("sum_in"), sum(col("lp_all")).as("sum_all"))

    toks.select(col("doc_id"))
      .join(contrib, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNotNull,
          round((col("sum_in") - col("sum_all")).cast("double") / (col("n_bigrams") * 1e6), 4))
          .otherwise(lit(0.0)).as("ml_score"),
        when(col("n_bigrams").isNotNull, col("sum_in") > col("sum_all"))
          .otherwise(lit(false)).as("keep"))
  }

  /** DuckDB twin over `table(doc_id, text)` with seed predicate
    * `inDomainSql` (a boolean SQL expression over the table's
    * columns); final relation `mlsc(doc_id, n_bigrams, ml_score,
    * keep)`.
    */
  def scoreSql(table: String, inDomainSql: String, lambda: Double = 0.5): String =
    s"""mltok AS (SELECT doc_id, ($inDomainSql) AS indom,
       |            string_split_regex(trim(lower(text)), '\\s+') AS toks
       |          FROM $table),
       |mlstream AS (
       |  SELECT doc_id, indom, toks[p.i] AS w1, toks[p.i + 1] AS w2
       |  FROM mltok, unnest(range(1, len(toks))) AS p(i)),
       |mluni_all AS (SELECT u.w AS w, count(*) AS ca
       |              FROM mltok, unnest(toks) AS u(w) GROUP BY u.w),
       |mluni_in AS (SELECT u.w AS w, count(*) AS ci
       |             FROM mltok, unnest(toks) AS u(w) WHERE indom GROUP BY u.w),
       |mlbi_all AS (SELECT w1, w2, count(*) AS c2a FROM mlstream GROUP BY w1, w2),
       |mlbi_in AS (SELECT w1, w2, count(*) AS c2i FROM mlstream WHERE indom GROUP BY w1, w2),
       |mlscal AS (SELECT (SELECT sum(ca) FROM mluni_all) AS t_all,
       |                  (SELECT count(*) FROM mluni_all) AS v_all,
       |                  (SELECT coalesce(sum(ci), 0) FROM mluni_in) AS t_in),
       |mlcontrib AS (
       |  SELECT s.doc_id,
       |    CAST(floor(ln(
       |      $lambda * CAST(ba.c2a AS DOUBLE) / ua1.ca
       |      + ${1.0 - lambda} * CAST(ua2.ca + 1 AS DOUBLE) / (sc.t_all + sc.v_all)) * 1e6)
       |      AS BIGINT) AS lp_all,
       |    CAST(floor(ln(
       |      CASE WHEN bi.c2i IS NOT NULL AND ui1.ci IS NOT NULL
       |           THEN $lambda * CAST(bi.c2i AS DOUBLE) / ui1.ci ELSE 0.0 END
       |      + ${1.0 - lambda} * CAST(coalesce(ui2.ci, 0) + 1 AS DOUBLE) / (sc.t_in + sc.v_all))
       |      * 1e6) AS BIGINT) AS lp_in
       |  FROM mlstream s
       |  JOIN mlbi_all ba USING (w1, w2)
       |  LEFT JOIN mlbi_in bi USING (w1, w2)
       |  JOIN mluni_all ua1 ON ua1.w = s.w1
       |  JOIN mluni_all ua2 ON ua2.w = s.w2
       |  LEFT JOIN mluni_in ui1 ON ui1.w = s.w1
       |  LEFT JOIN mluni_in ui2 ON ui2.w = s.w2
       |  CROSS JOIN mlscal sc),
       |mlagg AS (SELECT doc_id, count(*) AS n_bigrams,
       |            sum(lp_in) AS sum_in, sum(lp_all) AS sum_all
       |          FROM mlcontrib GROUP BY doc_id),
       |mlsc AS (
       |  SELECT t.doc_id,
       |    CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |    CASE WHEN a.n_bigrams IS NOT NULL
       |      THEN round(CAST(a.sum_in - a.sum_all AS DOUBLE) / (a.n_bigrams * 1e6), 4)
       |      ELSE 0.0 END AS ml_score,
       |    CASE WHEN a.n_bigrams IS NOT NULL
       |      THEN a.sum_in > a.sum_all ELSE false END AS keep
       |  FROM mltok t LEFT JOIN mlagg a USING (doc_id))""".stripMargin
}
