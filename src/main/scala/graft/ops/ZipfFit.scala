package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zipf rank–frequency fit — the corpus-health diagnostic: natural
  * text follows freq ∝ rank^(-s) with s ≈ 1; machine-generated spam,
  * template farms, and encoding noise bend the curve (s drifts far
  * from 1, or the log–log relation stops being linear). Fitting the
  * log–log slope per source flags which corpus slices stopped
  * looking like language — the distributional complement of C42's
  * per-source KL drift (which needs a reference distribution; the
  * Zipf exponent is reference-free).
  *
  * Semantics: per source, term frequencies use COMPETITION rank
  * (ties share rank = 1 + count of strictly-more-frequent terms —
  * no per-row tie-break window, and exactly what rank–frequency
  * plots use: equal frequencies are one plateau). x = ln(rank),
  * y = ln(freq) floored to integer micro-nats (the C42/C83 device),
  * least-squares moments in exact integers promoted through
  * DECIMAL(38,0) (the A43 device — Σxy at web-corpus vocabulary
  * sizes overflows int64), slope/corr derived identically in any
  * engine.
  *
  * Scale shape: one (source, term) partial-agg count shuffle over
  * the token stream; everything after runs on the vocabulary
  * relation (≪ corpus): the strictly-above cumulative is a window
  * over |distinct frequencies| rows per source (the A40 histogram
  * device applied descending), the moment sums one partial agg to
  * |sources| rows.
  */
object ZipfFit {

  /** (source, n_terms, n_tokens, slope, corr): log–log least-squares
    * slope (the fitted -s) and Pearson correlation (linearity check,
    * ~ -1 for natural text), both 4dp-rounded; null when the source
    * has < 2 distinct frequencies (degenerate fit).
    */
  def fit(df: DataFrame, source: Column, text: Column): DataFrame = {
    val terms = df
      .select(source.as("src"), explode(split(trim(lower(text)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("src"), col("w")).agg(count(lit(1)).as("c"))

    // competition rank from the frequency histogram: terms at
    // frequency c rank 1 + (count of terms with frequency > c)
    val fhist = terms.groupBy(col("src"), col("c")).agg(count(lit(1)).as("nc"))
    val wAbove = Window.partitionBy(col("src")).orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = fhist.select(col("src"), col("c"),
      (coalesce(sum(col("nc")).over(wAbove), lit(0L)) + 1L).as("rank"),
      col("nc"))

    // per (src, c): nc identical points at (ln(rank), ln(c)) — fold
    // the multiplicity into the moment sums instead of re-joining the
    // vocabulary relation
    val x = floor(log(col("rank").cast("double")) * 1e6).cast("bigint")
    val y = floor(log(col("c").cast("double")) * 1e6).cast("bigint")
    val pts = ranked.select(col("src"), col("nc"), x.as("x"), y.as("y"),
      (col("nc") * col("c")).as("tok"))
    val dec = "decimal(19,0)"
    val m = pts.groupBy(col("src")).agg(
      sum(col("nc")).as("n"), sum(col("tok")).as("n_tokens"),
      sum(col("nc") * col("x")).as("sx"), sum(col("nc") * col("y")).as("sy"),
      sum(col("nc").cast(dec) * col("x").cast(dec) * col("y").cast(dec))
        .cast("decimal(38,0)").as("sxy"),
      sum(col("nc").cast(dec) * col("x").cast(dec) * col("x").cast(dec))
        .cast("decimal(38,0)").as("sxx"),
      sum(col("nc").cast(dec) * col("y").cast(dec) * col("y").cast(dec))
        .cast("decimal(38,0)").as("syy"))
    val num = col("n").cast("decimal(38,0)") * col("sxy") -
      (col("sx").cast(dec) * col("sy").cast(dec)).cast("decimal(38,0)")
    val denX = col("n").cast("decimal(38,0)") * col("sxx") -
      (col("sx").cast(dec) * col("sx").cast(dec)).cast("decimal(38,0)")
    val denY = col("n").cast("decimal(38,0)") * col("syy") -
      (col("sy").cast(dec) * col("sy").cast(dec)).cast("decimal(38,0)")
    m.select(col("src").as("source"), col("n").as("n_terms"), col("n_tokens"),
      when(denX > 0, round(num.cast("double") / denX.cast("double"), 4))
        .as("slope"),
      when(denX > 0 && denY > 0,
        round(num.cast("double") /
          sqrt(denX.cast("double") * denY.cast("double")), 4)).as("corr"))
  }

  /** DuckDB twin of [[fit]] over `table(source, text)`; final
    * relation `zipf(source, n_terms, n_tokens, slope, corr)`.
    */
  def fitSql(table: String): String =
    s"""zt AS (SELECT source AS src, w.w AS w
       |       FROM $table, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w(w)
       |       WHERE w.w <> ''),
       |zc AS (SELECT src, w, count(*) AS c FROM zt GROUP BY src, w),
       |zh AS (SELECT src, c, count(*) AS nc FROM zc GROUP BY src, c),
       |zr AS (SELECT src, c, nc,
       |         1 + coalesce(sum(nc) OVER (PARTITION BY src ORDER BY c DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rank
       |       FROM zh),
       |zp AS (SELECT src, nc, nc * c AS tok,
       |         CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS x,
       |         CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y
       |       FROM zr),
       |zm AS (SELECT src, sum(nc) AS n, sum(tok) AS n_tokens,
       |         sum(nc * x) AS sx, sum(nc * y) AS sy,
       |         sum(CAST(nc AS HUGEINT) * x * y) AS sxy,
       |         sum(CAST(nc AS HUGEINT) * x * x) AS sxx,
       |         sum(CAST(nc AS HUGEINT) * y * y) AS syy
       |       FROM zp GROUP BY src),
       |zd AS (SELECT src, n, n_tokens,
       |         CAST(n AS HUGEINT) * sxy - sx * sy AS num,
       |         CAST(n AS HUGEINT) * sxx - sx * sx AS den_x,
       |         CAST(n AS HUGEINT) * syy - sy * sy AS den_y
       |       FROM zm),
       |zipf AS (SELECT src AS source, CAST(n AS BIGINT) AS n_terms,
       |           CAST(n_tokens AS BIGINT) AS n_tokens,
       |           CASE WHEN den_x > 0 THEN
       |             round(CAST(num AS DOUBLE) / CAST(den_x AS DOUBLE), 4) END AS slope,
       |           CASE WHEN den_x > 0 AND den_y > 0 THEN
       |             round(CAST(num AS DOUBLE)
       |               / sqrt(CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE)), 4) END AS corr
       |         FROM zd)""".stripMargin
}
