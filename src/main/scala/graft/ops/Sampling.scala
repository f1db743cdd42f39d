package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `rand()`
  * sampling is irreproducible across runs/partitionings and
  * engines; these operators derive the sampling decision from a
  * content hash, so the same corpus always yields the same sample —
  * on any cluster, in any engine (the DuckDB oracles reproduce them
  * exactly), and stably under re-partitioning.
  */
object Sampling {

  /** 2^60 — the hash space of [[Dedup.md5Hash60]]. */
  final val HashSpace = 1L << 60

  /** Keep rows whose 60-bit md5 of `key` falls in the first
    * `fraction` of the hash space. A narrow filter — no shuffle, no
    * state (the predicate is computed, so it does not push to the
    * scan, but it also never moves a row); proportional sampling
    * independent of row order or partitioning.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    val threshold = (BigDecimal(fraction) * BigDecimal(HashSpace)).toLong
    df.filter(Dedup.md5Hash60(key.cast("string")) < lit(threshold))
  }

  /** Exactly `nPerGroup` rows per group (fewer if the group is
    * smaller), chosen by hash order with the key as tiebreak — a
    * deterministic stratified sample. One shuffle on the group key;
    * rank is computed per group, never globally.
    */
  def stratifiedSample(df: DataFrame, group: Column, key: Column, nPerGroup: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group)
      .orderBy(Dedup.md5Hash60(key.cast("string")), key)
    df.withColumn("graft_rank", row_number().over(w))
      .filter(col("graft_rank") <= nPerGroup)
      .drop("graft_rank")
  }

  /** Weighted mixture sampling across sources: each source keeps its
    * own hash-fraction. Missing sources in `weights` are dropped.
    * Deterministic like [[hashSample]]; at scale this is the
    * "mix 30% web + 60% books + 10% code" step of corpus assembly.
    */
  def mixtureSample(
      df: DataFrame,
      source: Column,
      key: Column,
      weights: Map[String, Double]): DataFrame = {
    val thresholdBySource = weights.map { case (s, f) =>
      s -> (BigDecimal(f) * BigDecimal(HashSpace)).toLong
    }
    val thresholdCol = thresholdBySource.foldLeft(lit(-1L)) { case (acc, (s, t)) =>
      when(source === s, lit(t)).otherwise(acc)
    }
    df.filter(Dedup.md5Hash60(key.cast("string")) < thresholdCol)
  }

  /** Cumulative hash thresholds for a named split spec: `splits` is
    * (label, fraction) with fractions summing to ≤ 1; any remainder
    * of the hash space goes to the LAST label. Shared by the Spark
    * column and the SQL twin so both sides draw identical boundaries.
    */
  private[ops] def splitBounds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9)
    val cum = splits.scanLeft(BigDecimal(0)) { case (acc, (_, f)) => acc + BigDecimal(f) }.tail
    val bounds = splits.map(_._1).zip(cum.map(c => (c * BigDecimal(HashSpace)).toLong))
    bounds.init :+ (bounds.last._1 -> HashSpace) // last label absorbs rounding remainder
  }

  /** Deterministic disjoint-and-exhaustive dataset split (train /
    * valid / test …): the 60-bit content hash of `key` is bucketed by
    * cumulative fraction boundaries. A pure narrow expression — no
    * shuffle, no state; the same row lands in the same split on any
    * cluster, under any partitioning, and after corpus growth (new
    * rows never move old rows between splits, unlike row_number
    * striping). Disjointness/exhaustiveness hold by construction:
    * the boundaries partition [0, 2^60).
    */
  def assignSplit(key: Column, splits: Seq[(String, Double)]): Column = {
    val h = Dedup.md5Hash60(key.cast("string"))
    val bounds = splitBounds(splits)
    bounds.init.foldRight(lit(bounds.last._1): Column) { case ((label, hi), acc) =>
      when(h < lit(hi), lit(label)).otherwise(acc)
    }
  }

  /** Temperature-weighted source mixing (alpha = 0.5): per-group
    * sampling targets proportional to sqrt(group size), normalized —
    * the standard up-weight-the-tail mixture used when assembling a
    * multi-source / multilingual corpus (plain proportional sampling
    * lets the biggest source drown the rest; temperature flattening
    * re-balances without discarding the head entirely).
    *
    * Alpha is fixed at 0.5 because sqrt is correctly rounded under
    * IEEE-754 in every engine — `pow(x, alpha)` is not, and a last-ulp
    * difference could move a floor() target boundary between Spark
    * and the oracle. The normalizing denominator is folded LEFT TO
    * RIGHT over the group-name-sorted counts (a group-by sum of
    * doubles would be aggregation-order-dependent), so the weights
    * are bit-identical across engines and runs.
    *
    * Scale shape: group counts are one partial-aggregated shuffle;
    * the fold runs on the tiny per-group table; targets broadcast
    * back onto the per-group hash-ranked rows (one shuffle on the
    * group key for the rank window). Returns the input rows that made
    * the cut, plus (mix_rank, n_target).
    */
  def temperatureSample(df: DataFrame, group: Column, key: Column, budget: Int): DataFrame = {
    require(budget > 0)
    val base = df.withColumn("graft_g", group)
    val counts = base.groupBy(col("graft_g")).agg(count(lit(1)).as("n"))
    val denom = counts.agg(
      aggregate(
        sort_array(collect_list(struct(col("graft_g"), col("n")))),
        lit(0.0),
        (acc, x) => acc + sqrt(x.getField("n").cast("double"))).as("denom"))
    val targets = counts.crossJoin(broadcast(denom))
      .select(col("graft_g"),
        least(col("n"),
          floor(lit(budget.toDouble) * sqrt(col("n").cast("double")) / col("denom"))
            .cast("bigint")).as("n_target"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("graft_g"))
      .orderBy(Dedup.md5Hash60(key.cast("string")), key)
    base.withColumn("mix_rank", row_number().over(w).cast("bigint"))
      .join(broadcast(targets), Seq("graft_g"))
      .filter(col("mix_rank") <= col("n_target"))
      .drop("graft_g")
  }

  /** DuckDB twin of [[temperatureSample]]'s target computation over a
    * relation `table`: CTEs `tcounts` (group, n) and `ttargets`
    * (group, n_target) for a grouping expression `groupExpr`.
    */
  def temperatureTargetsSql(table: String, groupExpr: String, budget: Int): String =
    s"""tcounts AS (SELECT $groupExpr AS g, count(*) AS n FROM $table GROUP BY 1),
       |tdenom AS (SELECT list_reduce(
       |    list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(list(n ORDER BY g), x -> sqrt(CAST(x AS DOUBLE)))),
       |    (a, b) -> a + b) AS denom FROM tcounts),
       |ttargets AS (
       |  SELECT g, least(n,
       |    CAST(floor(CAST($budget AS DOUBLE) * sqrt(CAST(n AS DOUBLE)) / denom) AS BIGINT))
       |    AS n_target
       |  FROM tcounts, tdenom)""".stripMargin

  /** DuckDB twin of [[assignSplit]] over the same boundaries. */
  def assignSplitSql(keyExpr: String, splits: Seq[(String, Double)]): String = {
    val h = s"('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 15))::BIGINT"
    val bounds = splitBounds(splits)
    val whens = bounds.init
      .map { case (label, hi) => s"WHEN $h < $hi THEN '$label'" }.mkString(" ")
    s"CASE $whens ELSE '${bounds.last._1}' END"
  }
}
