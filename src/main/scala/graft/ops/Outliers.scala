package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier gating (median + MAD): flag rows whose
  * value sits more than `k` median-absolute-deviations from their
  * group's median — the standard robust filter for anomalous document
  * lengths / token counts per language or source, where mean/stddev
  * gates are themselves dragged by the outliers they should catch
  * (reference analog: the quality-gate family around
  * `py-gtfs-duckdb`'s monitor statistics; the pipeline use is
  * MassiveText/Gopher-style length-anomaly removal).
  *
  * Scale shape: NO `PARTITION BY group ORDER BY value` row window —
  * that funnels every group through one task (the C69 problem).
  * Both the median and the MAD come from the A40 device: one
  * partial-agg shuffle collapses rows to the (group, value, count)
  * DISTINCT-VALUE histogram, the cumulative window runs over that
  * histogram (|distinct values| rows per group, not |rows|), and the
  * interpolated percentile is a per-group aggregate over it. Rows
  * then join their group's (median, mad) — two broadcast-sized
  * relations of |groups| rows.
  *
  * Exactness: medians of integers are k/2-rationals (exact doubles);
  * deviations are exact; `1000*dev > kMilli*mad` and
  * `floor(1000*dev/mad)` are single correctly-rounded IEEE ops on
  * both engines, so the boolean gate and the milli-z are
  * engine-portable.
  */
object Outliers {

  /** Interpolated percentile per group from the distinct-value
    * histogram: (group, pval) with quantile_cont semantics —
    * pos = p·(n−1) zero-based over the sorted multiset,
    * v_lo/v_hi the values at floor/ceil(pos), linear interpolation
    * between them. Null values are ignored (quantile_cont parity).
    */
  def percentileByGroup(df: DataFrame, group: Column, value: Column,
      p: Double, outName: String): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"need 0 <= p <= 1, got $p")
    val hist = df
      .filter(value.isNotNull)
      .groupBy(group.as("__g"), value.cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pos = lit(p) * (sum(col("__c")).over(wAll) - lit(1L)).cast("double")
    val cum = hist
      .select(col("__g"), col("__v"), sum(col("__c")).over(wCum).as("__cum"),
        pos.as("__pos"))
    cum.groupBy(col("__g"))
      .agg((
        min(when(col("__cum") > floor(col("__pos")), col("__v"))) +
          (first(col("__pos")) - floor(first(col("__pos")))) *
          (min(when(col("__cum") > ceil(col("__pos")), col("__v"))) -
            min(when(col("__cum") > floor(col("__pos")), col("__v"))))
        ).as(outName))
  }

  /** Per-row robust flags: (id, group, value, med, mad,
    * robust_z_milli, is_outlier). `robust_z_milli` =
    * floor(1000·|v−med|/mad), null when the group's MAD is 0 (more
    * than half the group sits exactly on the median — no robust
    * scale exists, nothing is flagged). `is_outlier` ⟺
    * 1000·|v−med| > kMilli·mad, i.e. |v−med| > (kMilli/1000)·MAD.
    */
  def robustFlags(df: DataFrame, id: Column, group: Column, value: Column,
      kMilli: Long): DataFrame = {
    require(kMilli > 0, s"need a positive milli-threshold, got $kMilli")
    val base = df.select(id.as("__id"), group.as("__g"),
      value.cast("double").as("__v"))
    val med = percentileByGroup(base, col("__g"), col("__v"), 0.5, "med")
    val withDev = base.join(broadcast(med), Seq("__g"))
      .withColumn("__dev", abs(col("__v") - col("med")))
    val mad = percentileByGroup(withDev, col("__g"), col("__dev"), 0.5, "mad")
    withDev.join(broadcast(mad), Seq("__g"))
      .select(col("__id").as("id"), col("__g").as("group"),
        col("__v").as("value"), col("med"), col("mad"),
        when(col("mad") > 0,
          floor(lit(1000.0) * col("__dev") / col("mad")).cast("bigint"))
          .as("robust_z_milli"),
        (col("mad") > 0 &&
          lit(1000.0) * col("__dev") > lit(kMilli.toDouble) * col("mad"))
          .as("is_outlier"))
  }

  /** DuckDB twin of [[robustFlags]] over `table(idCol, groupCol,
    * valCol)`; final relation `rof(id, group, value, med, mad,
    * robust_z_milli, is_outlier)`.
    */
  def robustFlagsSql(table: String, idCol: String, groupCol: String,
      valCol: String, kMilli: Long): String =
    s"""ro1 AS (SELECT $idCol AS id, $groupCol AS grp,
       |          CAST($valCol AS DOUBLE) AS value,
       |          quantile_cont(CAST($valCol AS DOUBLE), 0.5)
       |            OVER (PARTITION BY $groupCol) AS med
       |        FROM $table WHERE $valCol IS NOT NULL),
       |ro2 AS (SELECT *, abs(value - med) AS dev FROM ro1),
       |ro3 AS (SELECT *, quantile_cont(dev, 0.5)
       |          OVER (PARTITION BY grp) AS mad FROM ro2),
       |rof AS (SELECT id, grp AS "group", value, med, mad,
       |          CASE WHEN mad > 0
       |            THEN CAST(floor(1000 * dev / mad) AS BIGINT) END
       |            AS robust_z_milli,
       |          (mad > 0 AND 1000 * dev > $kMilli * mad) AS is_outlier
       |        FROM ro3)""".stripMargin
}
