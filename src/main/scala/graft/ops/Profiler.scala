package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality audit that fronts every
  * ingest: per column, row/null/distinct counts and min/max. The
  * long-format output (one row per column) is what a catalog stores
  * and what drift monitors diff between snapshots (pairs with C28's
  * corpus diff).
  *
  * Scale shape: ONE pass over the table — all columns' aggregates
  * run in a single `agg` (the multi-countDistinct plans via Expand:
  * data × |cols| intermediate rows, partial-aggregated before the
  * shuffle; at 100 TB swap exact distinct for
  * `approx_count_distinct` or the C17 HLL sketch — same single-pass
  * shape, constant state). min/max are emitted as strings so the
  * schema is column-type-agnostic; profile integral/string columns
  * only (float renderings are not engine-portable).
  */
object Profiler {

  /** Long-format profile of `cols`: (column, n_rows, n_null,
    * n_distinct, min_val, max_val), one row per profiled column.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)

    val branches = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"${c}__nn").as("n_null"), col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_val"), col(s"${c}__mx").as("max_val"))
    }
    one.select(explode(array(branches: _*)).as("p")).select(col("p.*"))
  }

  /** Expected Benford leading-digit shares in micro-units:
    * round(1e6 * log10(1 + 1/d)) for d = 1..9. Inlined as integer
    * constants so both engines compare against the identical table.
    */
  final val BenfordMicro: Seq[Long] =
    (1 to 9).map(d => math.round(1e6 * math.log10(1.0 + 1.0 / d)))

  /** Benford leading-digit audit — the classic fabricated-data /
    * broken-generator smell test for a positive numeric column
    * (price-like fields should track Benford; uniform synthetics and
    * copy-paste rows do not). One partial-aggregated groupBy over a
    * 9-value key; entirely integer (shares in floor-micro units, the
    * expected table an inlined constant), so it hash-matches any
    * engine.
    *
    * @param units positive INTEGER column (fixed-point the value
    *              first, e.g. cents via floor(price * 100))
    * @return per digit 1..9: (digit, n, obs_micro, exp_micro,
    *         dev_micro = |obs - exp|) ordered by digit
    */
  def benfordAudit(df: DataFrame, units: org.apache.spark.sql.Column): DataFrame = {
    val obs = df.select(units.cast("bigint").as("u"))
      .filter(col("u") > 0L)
      .select(substring(col("u").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val expected = obs.sparkSession.createDataFrame(
      BenfordMicro.zipWithIndex.map { case (m, i) =>
        org.apache.spark.sql.Row(i + 1, m)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("digit",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("exp_micro",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val total = obs.agg(sum(col("n")).as("tot"))
    broadcast(expected).join(obs, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("(1000000 * n) DIV tot").as("obs_micro"), col("exp_micro"))
      .withColumn("dev_micro", abs(col("obs_micro") - col("exp_micro")))
  }

  /** DuckDB twin of [[profile]] over `table` (UNION ALL per column —
    * the oracle runs at test scale where re-scans are free).
    */
  def profileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
}
