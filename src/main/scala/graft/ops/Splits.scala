package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe dataset splits: assigning train/valid/test by
  * per-document hash (C19's [[Sampling.assignSplit]]) silently leaks
  * when the corpus contains near-duplicates — two ~identical
  * documents land in different splits and the eval set is
  * contaminated by construction. The fix used by every serious
  * pretraining pipeline: split by duplicate CLUSTER, not by document,
  * so a near-dup group moves as one unit.
  *
  * Scale shape: the cluster closure is C21's min-label propagation
  * ((id, label) pairs shuffle, never text); the split decision is a
  * pure narrow hash expression on the cluster id; documents outside
  * any pair graph never enter the propagation — they join nothing
  * (broadcast-sized component table for realistic dup rates, else a
  * keyed shuffle on the 8-byte doc id) and fall back to their own id
  * as a singleton cluster. Growth-stable like C19: new documents
  * never move an existing cluster between splits.
  */
object Splits {

  /** Assign every document a split so that near-duplicates share it.
    *
    * @param docs   one row per document
    * @param id     document id column (cast to bigint)
    * @param pairs  near-dup edges (id_a, id_b) from any C2-C5 detector
    * @param splits (label, fraction) list, fractions summing to <= 1
    * @return (doc_id, cluster_id, split); cluster_id is the C21
    *         min-reachable-id label, doc_id itself for singletons
    */
  def clusterSplit(docs: DataFrame, id: Column, pairs: DataFrame,
      splits: Seq[(String, Double)], maxIter: Int = 20): DataFrame = {
    val comp = DupClusters.connectedComponents(pairs, maxIter)
    docs.select(id.cast("bigint").as("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        Sampling.assignSplit(col("cluster_id").cast("string"), splits))
  }

  /** Stratified k-fold assignment: within every stratum the folds
    * are EXACTLY balanced (sizes differ by at most one) — the
    * cross-validation guarantee plain hash-bucketing (C19) cannot
    * give, because a hash split's per-stratum fold sizes are only
    * balanced in expectation.
    *
    * fold = per-stratum rank of the document's seeded 60-bit hash,
    * mod k. The rank uses the distributed prefix device from
    * [[EpochShuffle]] — per-(stratum, hash-range) counts prefix-sum
    * in a tiny window and broadcast back, within-range ranks are
    * range-partitioned — so a billion-row stratum never funnels
    * through one window task the way a naive
    * row_number() OVER (PARTITION BY stratum) would.
    *
    * @return (doc_id, stratum, fold) with fold in [0, k)
    */
  def stratifiedKFold(
      docs: DataFrame,
      id: Column,
      stratum: Column,
      k: Int,
      seed: String = "kfold"): DataFrame = {
    require(k >= 2, "k >= 2")
    import org.apache.spark.sql.expressions.Window
    val ranges = 256
    val rangeWidth = Sampling.HashSpace / ranges
    val rows = docs.select(id.cast("bigint").as("doc_id"), stratum.as("stratum"))
      .withColumn("hkey",
        Dedup.md5Hash60(concat(lit(seed + ":"), col("doc_id").cast("string"))))
      .withColumn("coarse", expr(s"hkey DIV ${rangeWidth}L"))

    val wOff = Window.partitionBy(col("stratum")).orderBy(col("coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy(col("stratum"), col("coarse"))
      .agg(count(lit(1)).as("cs"))
      .withColumn("offset", coalesce(sum(col("cs")).over(wOff), lit(0L)))
      .select(col("stratum"), col("coarse"), col("offset"))

    val wIn = Window.partitionBy(col("stratum"), col("coarse"))
      .orderBy(col("hkey"), col("doc_id"))
    rows.join(broadcast(offsets), Seq("stratum", "coarse"))
      .withColumn("rank", col("offset") + row_number().over(wIn).cast("bigint") - 1L)
      .select(col("doc_id"), col("stratum"),
        (col("rank") % k).cast("int").as("fold"))
  }

  /** Temporal leakage-safe split: train strictly before an embargo
    * gap, test strictly after the cutoff, the gap itself quarantined.
    * Time-ordered corpora (news, code commits, market data, RT feeds)
    * leak through plain random splits — a test document's near-twin
    * published minutes earlier lands in train. The standard fix is a
    * time cutoff PLUS an embargo buffer wide enough to absorb
    * publication lag / duplicate propagation, exactly as in financial
    * purged cross-validation.
    *
    * Boundaries are derived from the observed span in integer
    * microseconds: cutoff = min + span·trainPermille/1000,
    * embargo width = span·embargoPermille/1000 (integer division —
    * bit-exact across engines). Row rule, in event-time micros t:
    * train: t < cutoff − embargo; embargo: cutoff − embargo ≤ t <
    * cutoff; test: t ≥ cutoff. Disjoint and exhaustive by
    * construction.
    *
    * Scale shape: ONE min/max aggregate produces a 1-row scalar
    * (broadcast), assignment is a narrow expression, no shuffle
    * beyond the final bounded summary agg.
    *
    * @return one row per (split, group): (split, group, n,
    *         min_ts_us, max_ts_us)
    */
  def timeSplit(
      df: DataFrame,
      ts: Column,
      group: Column,
      trainPermille: Int = 800,
      embargoPermille: Int = 50): DataFrame = {
    require(trainPermille > 0 && trainPermille < 1000, "trainPermille in (0,1000)")
    require(embargoPermille >= 0 && embargoPermille < trainPermille,
      "embargo must fit inside the train span")
    val t = unix_micros(ts)
    val span = df.agg(min(t).as("__min_us"), max(t).as("__max_us"))
    df.select(t.as("t_us"), group.as("group"))
      .crossJoin(broadcast(span))
      // `div` (integer division), never `/`: Spark's `/` on longs is
      // DOUBLE division, and span·permille can exceed 2^53
      .withColumn("__cutoff",
        expr(s"__min_us + (__max_us - __min_us) * $trainPermille div 1000"))
      .withColumn("__gap",
        expr(s"(__max_us - __min_us) * $embargoPermille div 1000"))
      .withColumn("split",
        when(col("t_us") < col("__cutoff") - col("__gap"), "train")
          .when(col("t_us") < col("__cutoff"), "embargo")
          .otherwise("test"))
      .groupBy(col("split"), col("group"))
      .agg(count(lit(1)).as("n"),
        min(col("t_us")).as("min_ts_us"),
        max(col("t_us")).as("max_ts_us"))
  }

  /** DuckDB twin of [[timeSplit]] over `events(ts, event_type)`.
    * Integer division in DuckDB is `//`; epoch_us(ts) is Spark's
    * unix_micros.
    */
  def timeSplitSql(
      trainPermille: Int = 800,
      embargoPermille: Int = 50): String =
    s"""WITH sp AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events),
       |a AS (SELECT epoch_us(ts) AS t_us, event_type AS "group",
       |        sp.mn + (sp.mx - sp.mn) * $trainPermille // 1000 AS cutoff,
       |        (sp.mx - sp.mn) * $embargoPermille // 1000 AS gap
       |      FROM events CROSS JOIN sp),
       |b AS (SELECT CASE WHEN t_us < cutoff - gap THEN 'train'
       |                  WHEN t_us < cutoff THEN 'embargo'
       |                  ELSE 'test' END AS split,
       |        "group", t_us
       |      FROM a)
       |SELECT split, "group", count(*) AS n,
       |  min(t_us) AS min_ts_us, max(t_us) AS max_ts_us
       |FROM b GROUP BY split, "group"
       |ORDER BY split, "group"""".stripMargin
}
