package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chi-square feature selection — rank vocabulary terms by how
  * strongly their document-level presence associates with a class
  * label. The standard pre-filter before training a lightweight
  * classifier (C99): keep the top-N discriminative terms, drop the
  * noise dimensions, and the hashed bag-of-words (C70) collides far
  * less for the features that matter. Also the working core of a
  * "distinctive vocabulary per source/domain" report.
  *
  * Determinism: every contingency cell is an integer count; the
  * chi-square statistic is computed per class in exact DECIMAL(38,0)
  * arithmetic over the closed form
  *
  *   chi2 = sum_c D_c^2 / (n_c * df * (n - df)),
  *   D_c  = n * df_c - df * n_c
  *
  * (algebraically identical to sum (O-E)^2/E over the 2x|C| table),
  * emitted as a floor-milli integer PER CLASS before the sum — so
  * the cross-engine result is bit-exact: integer sums are
  * associative, no float addition order can flip a rank. D_c^2 can
  * reach (n * n_c)^2 ~ 1e23 at million-doc scale, past int64 — the
  * decimal intermediate is mandatory, but no decimal escapes into
  * the output schema (SURVEY §4).
  *
  * Scale shape: one explode of the token stream, distinct on
  * (doc, token) — fixed-width after hashing? No: tokens stay
  * strings here because the output IS the vocabulary; the groupBys
  * partial-aggregate before shuffling, class totals are a tiny
  * broadcast, and the final top-N is a TakeOrdered (no global
  * window over the vocabulary).
  */
object FeatureSelect {

  /** Top-N tokens by chi-square association with `label`.
    *
    * @param minDf drop tokens present in fewer docs (noise floor)
    * @return (token, df, chi2_milli, top_class, rk) — rk 1..topN by
    *         (chi2_milli desc, token); top_class = the class with
    *         the largest positive D_c (ties: first class name)
    */
  def chiSquare(
      docs: DataFrame,
      id: Column,
      text: Column,
      label: Column,
      minDf: Int = 5,
      topN: Int = 50): DataFrame = {
    // per-doc presence WITHOUT a corpus-wide distinct: dedup happens
    // inside the row (array_distinct over the token array), so the
    // exploded stream is unique-(doc, token) by construction and the
    // only corpus-sized exchange left is the (token, cls) partial agg
    // below (the SetSimJoin zero-shuffle-dedup device, guide §2.4).
    // PRECONDITION (ADVICE r13): `id` must be unique per input row —
    // a duplicated doc_id would contribute its tokens' df once PER
    // ROW here, while the DuckDB twin (q_chi2_features) runs a
    // corpus-wide SELECT DISTINCT and would collapse them, so the
    // engines agree only under that contract. Every caller feeds a
    // primary-keyed table (documents.doc_id holds it by
    // construction); a non-keyed caller must distinct its input.
    val pres = docs
      .select(id.cast("bigint").as("doc_id"), label.cast("string").as("cls"),
        explode(array_distinct(split(trim(lower(text)), "\\s+"))).as("token"))
      .filter(col("token") =!= "")

    // tiny: |C| rows, broadcast into every downstream join
    val classTotals = docs.select(label.cast("string").as("cls"))
      .groupBy(col("cls")).agg(count(lit(1)).as("n_c"))
    val nDocs = docs.select(id).count()

    val perClass = pres.groupBy(col("token"), col("cls"))
      .agg(count(lit(1)).as("df_c"))
    val dfTot = perClass.groupBy(col("token")).agg(sum(col("df_c")).as("df"))

    // Every class must contribute a term even when df_c = 0 there
    // (D_c = -df * n_c != 0), so complete the (token, class) grid
    // against the tiny class table before scoring.
    val grid = dfTot
      // bounds first: df = n makes the (n - df) denominator zero, and
      // ANSI mode (Spark 4 default) faults the division eagerly
      .filter(col("df") >= minDf && col("df") < nDocs)
      .crossJoin(broadcast(classTotals))
      .join(perClass, Seq("token", "cls"), "left")
      .withColumn("df_c", coalesce(col("df_c"), lit(0L)))

    val dec = "CAST(%s AS DECIMAL(38,0))"
    val dcExpr = s"(${dec.format(nDocs + "")} * ${dec.format("df_c")}" +
      s" - ${dec.format("df")} * ${dec.format("n_c")})"
    val termMilli = expr(
      s"CAST((1000 * $dcExpr * $dcExpr) DIV " +
        s"(${dec.format("n_c")} * ${dec.format("df")} * " +
        s"${dec.format(s"(${nDocs}L - df)")}) AS BIGINT)")

    val scored = grid
      .withColumn("term_milli", termMilli)
      .withColumn("d_c", expr(s"CAST($dcExpr AS BIGINT)"))
      .groupBy(col("token"), col("df"))
      .agg(sum(col("term_milli")).as("chi2_milli"),
        min(struct((-col("d_c")).as("nd"), col("cls").as("c"))).as("best"))
      .withColumn("top_class", col("best.c"))
      .drop("best")

    scored
      .orderBy(col("chi2_milli").desc, col("token"))
      .limit(topN)
      .withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("chi2_milli").desc, col("token"))).cast("bigint"))
      .select(col("token"), col("df"), col("chi2_milli"), col("top_class"), col("rk"))
  }
}
