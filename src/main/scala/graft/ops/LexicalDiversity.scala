package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group lexical diversity — the corpus-linguistics health
  * metrics (type-token ratio, hapax share, Simpson's repeat
  * probability) that flag degenerate sources before they reach
  * training: machine-generated or template text shows a LOW
  * type-token ratio and HIGH Simpson concentration (few types absorb
  * the token mass), scraped gibberish shows the opposite extreme
  * (almost every token a hapax). Complements C90 (Zipf slope fits
  * the rank-frequency SHAPE) and C130 (Heaps fits vocabulary GROWTH)
  * with the point-in-time concentration numbers.
  *
  * Exactness: Simpson's D = Σ f(f−1) / (N(N−1)) — the unbiased
  * repeat probability — computed as integer micro units by floor
  * division over DECIMAL(38,0) moment sums (the A43 device; f(f−1)
  * sums overflow int64 on a 100 TB source), TTR as milli by integer
  * floor division. No float addition order anywhere.
  *
  * Scale shape: one (group, token)-keyed partial-agg count, one
  * group-keyed rollup — two linear shuffles, the same budget as C26
  * vocabulary stats.
  */
object LexicalDiversity {

  /** (source, n_tokens, n_types, n_hapax, ttr_milli, simpson_micro)
    * per group; simpson_micro is NULL for a group with < 2 tokens.
    */
  def perGroup(df: DataFrame, group: Column, text: Column): DataFrame = {
    val tf = df
      .select(group.as("grp"), explode(split(trim(lower(text)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("f"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    tf.groupBy(col("grp"))
      .agg(
        sum(col("f")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(dec(col("f")) * (dec(col("f")) - 1)).as("sfm1"))
      .select(
        col("grp").as("source"),
        col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("CAST((1000 * n_types) DIV n_tokens AS BIGINT)").as("ttr_milli"),
        when(col("n_tokens") >= 2,
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sfm1) DIV " +
            "(CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1)) AS BIGINT)"))
          .as("simpson_micro"))
      .orderBy(col("source"))
  }

  /** DuckDB twin over `table(text, <groupExpr>)`; final relation
    * `ldout(source, n_tokens, n_types, n_hapax, ttr_milli,
    * simpson_micro)`.
    */
  def perGroupSql(table: String, groupExpr: String): String =
    s"""ldtf AS (SELECT $groupExpr AS grp, u.t AS tok, count(*) AS f
       |  FROM $table, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(t)
       |  WHERE u.t <> '' GROUP BY $groupExpr, u.t),
       |ldagg AS (SELECT grp,
       |    CAST(sum(f) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS n_types,
       |    CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       |    sum(CAST(f AS HUGEINT) * (f - 1)) AS sfm1
       |  FROM ldtf GROUP BY grp),
       |ldout AS (SELECT grp AS source, n_tokens, n_types, n_hapax,
       |    CAST((1000 * n_types) // n_tokens AS BIGINT) AS ttr_milli,
       |    CASE WHEN n_tokens >= 2
       |      THEN CAST((1000000 * sfm1) // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
       |           AS BIGINT) END AS simpson_micro
       |  FROM ldagg)""".stripMargin
}
