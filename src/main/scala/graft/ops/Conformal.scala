package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal acceptance threshold — the distribution-free
  * coverage guarantee for a filtering gate: pick the threshold off a
  * held-out calibration set so that "accept when nonconformity <=
  * q_hat" covers at least (1 - alpha) of true positives in
  * expectation, NO assumptions on the scorer. This is how a C99/C41
  * quality gate ships with a stated recall floor instead of a
  * hand-tuned cutoff (C114 picks the impurity-optimal split; this
  * picks the guaranteed-coverage one).
  *
  * q_hat is the ceil((n+1)(1-alpha))-th smallest calibration
  * nonconformity — an exact integer order statistic, computed over
  * the DISTINCT-score histogram (the C102/C87 device: one
  * partial-agg groupBy, cumulative window over <= |distinct scores|
  * rows), never a per-row global sort. When the rank exceeds n the
  * threshold is unbounded (accept everything) — reported as the
  * int64 max sentinel, exact on both engines.
  *
  * Everything is integer: scores, ranks, the ceil-division
  * ((n+1)(1000 - alphaMilli) + 999) DIV 1000, and the coverage
  * count; only the final coverage share is a single rounded
  * division.
  */
object Conformal {

  final val Unbounded = Long.MaxValue

  /** Calibrate on `cal`, audit empirical coverage on `eval`.
    *
    * @param cal  calibration nonconformity scores (column `s`,
    *             integral; LOWER = more conforming)
    * @param eval held-out nonconformity scores (column `s`)
    * @return one row: (n_cal, q_index, q_hat, n_eval, n_covered,
    *         coverage_milli, target_milli)
    */
  def coverageAudit(cal: DataFrame, eval: DataFrame, alphaMilli: Long,
      distinctCutoff: Long = EquiDepth.AutoDistinctCutoff,
      forcePartitioned: Boolean = false): DataFrame = {
    require(alphaMilli > 0 && alphaMilli < 1000, "alphaMilli in (0, 1000)")
    // cumulative rank over the distinct-score histogram via the shared
    // auto-strategy prefix device (C102/A40): one small window under
    // the cutoff, the two-pass partitioned prefix above it — a
    // near-continuous milli-score domain never funnels through a
    // single-partition sort. n_cal rides as a one-row broadcast
    // instead of an unbounded unpartitioned window.
    val hist = cal.select(col("s").cast("bigint").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val totals = hist.agg(sum(col("c")).as("n_cal"))
    val cum = EquiDepth
      .cumAutoMulti(hist, Seq("c"), asc = true, distinctCutoff, forcePartitioned)
      .withColumn("cum", col("cum_before_c") + col("c"))
      .withColumnRenamed("v", "s")
      .crossJoin(broadcast(totals))
      .withColumn("q_index",
        expr(s"((n_cal + 1) * (1000 - $alphaMilli) + 999) DIV 1000"))
    // the threshold row: smallest score whose cumulative count
    // reaches the conformal rank; none -> unbounded sentinel
    // ONE aggregate replaces the former two-branch union (min over the
    // reaching rows ∪ sentinel when none reach): min(when(cum ≥ qi, s))
    // is NULL exactly when no row reaches the conformal rank, so
    // coalesce(…, sentinel) is the same q_hat — and the cum subtree is
    // evaluated once instead of once per branch.
    val thr = cum
      .groupBy(col("n_cal"), col("q_index"))
      .agg(coalesce(min(when(col("cum") >= col("q_index"), col("s"))),
        lit(Unbounded)).as("q_hat"))

    eval.select(col("s").cast("bigint").as("es"))
      .crossJoin(broadcast(thr))
      .groupBy(col("n_cal"), col("q_index"), col("q_hat"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("es") <= col("q_hat"), 1L).otherwise(0L)).as("n_covered"))
      .select(col("n_cal"), col("q_index"), col("q_hat"),
        col("n_eval"), col("n_covered"),
        round(col("n_covered").cast("double") / col("n_eval"), 4)
          .as("coverage"),
        lit((1000 - alphaMilli) / 1000.0).as("target"))
  }

  /** DuckDB twin over CTEs `cal(s)` and `ev(s)`; emits the
    * WITH-chain tail + final SELECT.
    */
  def coverageAuditSqlTail(alphaMilli: Long): String =
    s"""hist AS (SELECT CAST(s AS BIGINT) AS s, count(*) AS c FROM cal GROUP BY 1),
       |cum AS (SELECT s,
       |          CAST(sum(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |          CAST(sum(c) OVER () AS BIGINT) AS n_cal
       |        FROM hist),
       |qi AS (SELECT n_cal,
       |         CAST(((n_cal + 1) * (1000 - $alphaMilli) + 999) // 1000 AS BIGINT) AS q_index
       |       FROM cum LIMIT 1),
       |thr AS (
       |  SELECT qi.n_cal, qi.q_index,
       |    coalesce((SELECT min(s) FROM cum WHERE cum.cum >= qi.q_index),
       |             ${Unbounded}) AS q_hat
       |  FROM qi)
       |SELECT t.n_cal, t.q_index, t.q_hat,
       |  CAST(count(*) AS BIGINT) AS n_eval,
       |  CAST(sum(CASE WHEN e.s <= t.q_hat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       |  round(CAST(sum(CASE WHEN e.s <= t.q_hat THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 4) AS coverage,
       |  CAST(${(1000 - alphaMilli) / 1000.0} AS DOUBLE) AS target
       |FROM ev e, thr t
       |GROUP BY t.n_cal, t.q_index, t.q_hat""".stripMargin
}
