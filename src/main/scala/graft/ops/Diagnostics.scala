package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKAgg

/** Key-skew diagnosis (C76): the per-key count distribution of a
  * prospective shuffle key — heavy keys, exact nearest-rank
  * percentiles of group size, and the row share the top keys hold.
  * The measurement that DECIDES whether [[Salting]] (the mitigation)
  * or an AQE skew-join is needed before a 100 TB `groupBy`/`join` on
  * that key, replacing the reference stack's ad-hoc
  * `GROUP BY ... ORDER BY count(*) DESC LIMIT n` probes.
  *
  * Scale shape: ONE partial-agg shuffle collapses the corpus to
  * (key, n) — everything after runs on relations bounded by the key
  * cardinality or smaller:
  *  - heavy keys via the C66 bounded heap on (n, md5₆₀(key)): ≤ topN
  *    pairs per task reach the final heap — never a global sort or a
  *    single-task window over the count table (billions of rows when
  *    the key is a URL/domain) — then ONE broadcast join of the ≤topN
  *    winners back against the counts recovers the key strings;
  *  - percentiles over the DISTINCT-GROUP-SIZE histogram (the A40
  *    equi-depth device): the prefix window orders ≤ |distinct sizes|
  *    rows — PROVABLY ≤ √(2·n_rows) (distinct sizes are distinct
  *    positive integers summing to n_rows, so k distinct sizes force
  *    n_rows ≥ k(k+1)/2): ~450 k rows at 10¹¹ input rows, a few MB
  *    through one task at the worst case, not a funnel;
  *  - the global stats row is a broadcast scalar joined onto the
  *    heavy-key rows.
  * Heavy-key ties at the topN boundary break by md5₆₀(key) — the
  * hash IS the heap's total order, it is reproducible by the twin,
  * and it does not bias toward lexicographically small keys. All
  * outputs are exact integers (share in milli-units), so the DuckDB
  * twin reproduces them bit for bit.
  */
object Diagnostics {

  /** Top-`topN` heaviest keys, each row carrying the global skew
    * profile: (rank, key, n, n_keys, n_rows, max_n, p50_n, p90_n,
    * p99_n, top_share_milli). Percentiles are nearest-rank (smallest
    * group size s with |{keys: n ≤ s}| ≥ ⌈q·n_keys⌉); top_share_milli
    * is the topN keys' row share in thousandths (integer floor).
    */
  def keySkew(df: DataFrame, key: Column, topN: Int): DataFrame = {
    require(topN >= 1, s"need at least one heavy key, got $topN")
    val counts = df.groupBy(key.cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
      .withColumn("kh", Dedup.md5Hash60(col("key")))
      .sharedPersist()

    // bounded heap: best = (n desc, hash asc); score = n, id = hash
    val winners = counts
      .agg(TopKAgg.topK(col("n"), col("kh"), topN).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.id").as("kh"), col("col.score").as("n"))
    // recover key strings: ≤ topN winners broadcast against counts;
    // the defensive rank re-cut covers the astronomically-unlikely
    // (hash, n) collision admitting an extra row
    val wRank = Window.partitionBy(lit(1)).orderBy(col("n").desc, col("kh"))
    val heavy = counts.join(broadcast(winners), Seq("kh", "n"), "left_semi")
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= topN)

    // distinct-group-size histogram, prefix-summed: ≤ |distinct n| rows
    val hist = counts.groupBy(col("n").as("size")).agg(count(lit(1)).as("freq"))
    val wCum = Window.partitionBy(lit(1)).orderBy(col("size"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum_keys", sum(col("freq")).over(wCum))

    // Totals + all three nearest-rank percentiles in ONE pass over the
    // cumulative histogram: n_keys/n_rows/max_n are derivable from the
    // (size, freq) histogram itself (Σfreq, Σ size·freq, max size), so
    // the former second full agg over `counts` + its broadcast round
    // are gone; the key-count total rides as one more window over the
    // same bounded, whitelisted histogram frame.
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def pctCol(q: Double, name: String): Column =
      min(when(col("cum_keys") >= ceil(col("__nk") * lit(q)), col("size")))
        .cast("bigint").as(name)
    val pcts = cum.withColumn("__nk", sum(col("freq")).over(wAll))
      .agg(max(col("__nk")).as("n_keys"),
        sum(col("size") * col("freq")).as("n_rows"),
        max(col("size")).as("max_n"),
        pctCol(0.5, "p50_n"), pctCol(0.9, "p90_n"), pctCol(0.99, "p99_n"))

    val topShare = heavy.agg(sum(col("n")).as("top_rows"))
    val stats = pcts
      .crossJoin(topShare)
      .withColumn("top_share_milli",
        ((col("top_rows") * lit(1000L) - pmod(col("top_rows") * lit(1000L), col("n_rows")))
          / col("n_rows")).cast("bigint"))
      .drop("top_rows")

    heavy.select(col("rank").cast("bigint").as("rank"), col("key"), col("n"))
      .crossJoin(broadcast(stats))
  }

  /** DuckDB twin of [[keySkew]] over `table` and key expression
    * `keyExpr` (same hash tie-break, same nearest-rank percentiles).
    */
  def keySkewSql(table: String, keyExpr: String, topN: Int): String = {
    def hash60(x: String) = s"('0x'||substr(md5($x),1,15))::BIGINT"
    s"""WITH counts AS (
       |  SELECT CAST($keyExpr AS VARCHAR) AS key, count(*) AS n,
       |    ${hash60(s"CAST($keyExpr AS VARCHAR)")} AS kh
       |  FROM $table GROUP BY 1),
       |heavy AS (
       |  SELECT key, n, rank FROM (
       |    SELECT key, n,
       |      CAST(row_number() OVER (ORDER BY n DESC, kh) AS BIGINT) AS rank
       |    FROM counts) t
       |  WHERE rank <= $topN),
       |hist AS (SELECT n AS size, count(*) AS freq FROM counts GROUP BY n),
       |cum AS (SELECT size, SUM(freq) OVER (ORDER BY size
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_keys
       |        FROM hist),
       |tot AS (SELECT count(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows,
       |          max(n) AS max_n
       |        FROM counts),
       |p50 AS (SELECT CAST(min(size) AS BIGINT) AS p50_n FROM cum, tot
       |        WHERE cum_keys >= ceil(n_keys * 0.5)),
       |p90 AS (SELECT CAST(min(size) AS BIGINT) AS p90_n FROM cum, tot
       |        WHERE cum_keys >= ceil(n_keys * 0.9)),
       |p99 AS (SELECT CAST(min(size) AS BIGINT) AS p99_n FROM cum, tot
       |        WHERE cum_keys >= ceil(n_keys * 0.99)),
       |ts AS (SELECT CAST(SUM(n) AS BIGINT) AS top_rows FROM heavy)
       |SELECT h.rank, h.key, h.n, tot.n_keys, tot.n_rows, tot.max_n,
       |  p50.p50_n, p90.p90_n, p99.p99_n,
       |  CAST((ts.top_rows * 1000) // tot.n_rows AS BIGINT) AS top_share_milli
       |FROM heavy h, tot, p50, p90, p99, ts
       |ORDER BY h.rank""".stripMargin
  }
}
