package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group embedding pooling: element-wise mean of a group's
  * vectors plus the L2-renormalized prototype — the standard way
  * chunk embeddings become document embeddings, class embeddings
  * become classifier init / semantic-search anchors, and source
  * slices get comparable "centroid drift" fingerprints.
  *
  * Scale shape: NO row explosion — each of the `dim` components is a
  * plain SUM aggregate over `element_at(vec, i)`, so the pooling is
  * one partial-agg shuffle carrying `dim` longs per (task, group)
  * instead of the posexplode form's rows·dim shuffled rows. The
  * group count bounds the result size.
  *
  * Integer fixed-point: inputs quantize to floor(x·scale) longs;
  * mean is truncating long division (Java `/` == DuckDB `//` on
  * these values — both truncate toward zero); the unit vector uses
  * only IEEE exactly-rounded ops (sqrt, /, ·) on integer-derived
  * doubles, so floor(·1e4) is bit-identical across engines.
  */
object EmbeddingPool {

  /** (group, n, centroid_e3, unit_e4): per-group count, the
    * element-wise mean in scale-units, and the L2-normalized mean in
    * 1e-4 units — both comma-joined strings (integers format
    * identically everywhere; doubles do not).
    */
  def groupCentroids(
      df: DataFrame,
      group: Column,
      vec: Column,
      dim: Int,
      scale: Long = 1000L): DataFrame = {
    require(dim >= 1, "dim must be positive")
    val qv = IvfIndex.quantized(vec, scale)
    val sums = (0 until dim).map(i =>
      sum(element_at(col("__qv"), i + 1)).as(s"__s$i"))
    val means = (0 until dim).map(i =>
      expr(s"__s$i div __n").as(s"__m$i"))
    val cent = array((0 until dim).map(i => col(s"__m$i")): _*)
    df.select(group.as("group"), qv.as("__qv"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("__n"), sums: _*)
      .select(col("group") +: col("__n") +: means: _*)
      .select(col("group"), col("__n").as("n"), cent.as("__cent"))
      .withColumn("__norm2",
        aggregate(transform(col("__cent"), x => x * x), lit(0L), (a, x) => a + x))
      .select(col("group"), col("n"),
        array_join(transform(col("__cent"), x => x.cast("string")), ",")
          .as("centroid_e3"),
        array_join(
          transform(col("__cent"), x =>
            when(col("__norm2") === 0L, lit(0L))
              .otherwise(floor(lit(10000.0) * x / sqrt(col("__norm2").cast("double"))))
              .cast("long").cast("string")),
          ",").as("unit_e4"))
  }

  /** Per-group semantic dispersion WITHOUT a pairwise join: for
    * unit vectors, Σ_{i≠j} uᵢ·uⱼ = ‖Σu‖² − Σ‖uᵢ‖², so the mean
    * pairwise cosine of a group falls out of ONE aggregation pass —
    * the redundancy metric (mean cos → 1: the source is semantic
    * boilerplate; → 0: diverse) that would naively cost an n² join
    * per group. 100 TB shape: dim SUM partial-aggs + two scalar sums
    * per group, nothing pairwise anywhere.
    *
    * Vectors are L2-normalized then quantized to floor(u·1e4) longs
    * (the q_vector_norm parity device: normalize uses only IEEE
    * exactly-rounded ops); sums of squares run in decimal so a
    * billion-row group cannot overflow. The final division happens
    * once in double on bit-identical integer inputs.
    *
    * @return (group, n, mean_pair_cos_micro, centroid_norm_micro):
    *         mean pairwise cosine ·1e6 (null for n < 2) and the mean
    *         vector's norm ·1e6 relative to unit inputs.
    */
  def dispersion(
      df: DataFrame,
      group: Column,
      vec: Column,
      dim: Int): DataFrame = {
    require(dim >= 1, "dim must be positive")
    // codegen'd unit-quantization kernel (parity-spec'd against the
    // l2Normalize+floor composition it replaces)
    val qv = graft.plans.UnitQuantExpr.unitQuant(vec)
    val dec = "decimal(38,0)"
    // accumulate in decimal(38,0), not BIGINT: per-row __q2 is up to
    // dim·1e8 (~6.4e9 at dim 64), so a BIGINT sum wraps silently past
    // ~1.4e9 rows per group under Spark's non-ANSI arithmetic while
    // the DuckDB twin's HUGEINT keeps going — the cast must sit on the
    // aggregate INPUT. Per-dim sums (|qv[i]| ≤ 1e4) get the same
    // treatment so groups beyond ~9e14 rows stay exact too.
    val sums = (0 until dim).map(i =>
      sum(element_at(col("__qv"), i + 1).cast(dec)).as(s"__s$i"))
    val q2 = aggregate(col("__qv"), lit(0L), (a, x) => a + x * x)
    val s2 = (0 until dim)
      .map(i => col(s"__s$i") * col(s"__s$i"))
      .reduce(_ + _)
    df.select(group.as("group"), qv.as("__qv"))
      .select(col("group"), col("__qv"), q2.as("__q2"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("__n"),
        (sum(col("__q2").cast(dec)).as("__sq2") +: sums): _*)
      .select(col("group"), col("__n").as("n"),
        when(col("__n") >= 2L,
          floor((s2 - col("__sq2")).cast("double") * 1e6 /
            (col("__n") * (col("__n") - 1L)).cast("double") / 1e8).cast("bigint"))
          .as("mean_pair_cos_micro"),
        floor(sqrt(s2.cast("double")) * lit(100.0) / col("__n").cast("double"))
          .cast("bigint").as("centroid_norm_micro"))
  }

  /** DuckDB twin of [[dispersion]] over `embeddings(label,
    * embedding)`. The unit-vector chain mirrors q_vector_norm's,
    * with the zero-norm guard the Spark kernel gets for free:
    * UnitQuantExpr maps an all-zero vector to zeros (floor(0/0)=NaN,
    * NaN.toLong==0) while DuckDB's CAST(NaN AS BIGINT) ERRORS — so
    * the twin must short-circuit norm=0 to 0 or one degenerate
    * embedding aborts the oracle while Spark succeeds.
    */
  def dispersionSql(dim: Int): String =
    s"""WITH nr AS (SELECT label AS "group",
       |             CAST(embedding AS DOUBLE[]) AS ev,
       |             list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
       |                                           y -> y * y), 'sum') AS nrm2
       |           FROM embeddings),
       |ue AS (SELECT "group",
       |         list_transform(ev, x ->
       |           CAST(CASE WHEN nrm2 = 0 THEN 0
       |                ELSE floor(x / sqrt(nrm2) * 10000) END AS BIGINT)) AS qv
       |       FROM nr),
       |rq AS (SELECT "group", qv,
       |         list_aggregate(list_transform(qv, x -> x * x), 'sum') AS q2
       |       FROM ue),
       |ag AS (SELECT "group", count(*) AS n,
       |         CAST(sum(q2) AS HUGEINT) AS sq2,
       |         ${(0 until dim).map(i => s"CAST(sum(qv[${i + 1}]) AS HUGEINT) AS s$i")
             .mkString(",\n         ")}
       |       FROM rq GROUP BY "group"),
       |fin AS (SELECT "group", n,
       |          ${(0 until dim).map(i => s"s$i * s$i").mkString("(", " + ", ")")} AS s2,
       |          sq2
       |        FROM ag)
       |SELECT "group", CAST(n AS BIGINT) AS n,
       |  CASE WHEN n >= 2 THEN
       |    CAST(floor(CAST(s2 - sq2 AS DOUBLE) * 1e6
       |         / CAST(n * (n - 1) AS DOUBLE) / 1e8) AS BIGINT) END
       |    AS mean_pair_cos_micro,
       |  CAST(floor(sqrt(CAST(s2 AS DOUBLE)) * 100.0 / CAST(n AS DOUBLE)) AS BIGINT)
       |    AS centroid_norm_micro
       |FROM fin ORDER BY "group"""".stripMargin

  /** DuckDB twin over `embeddings(label, embedding)` grouped by
    * label; same quantization, truncating division, and exactly-
    * rounded renorm chain.
    */
  def groupCentroidsSql(dim: Int, scale: Long = 1000L): String =
    s"""WITH e AS (SELECT label AS "group",
       |             list_transform(CAST(embedding AS DOUBLE[]),
       |                            x -> CAST(floor(x * $scale) AS BIGINT)) AS qv
       |           FROM embeddings),
       |s AS (SELECT "group", u.i AS d,
       |        CAST(sum(qv[u.i]) AS BIGINT) AS sm, count(*) AS n
       |      FROM e, unnest(range(1, ${dim + 1})) AS u(i)
       |      GROUP BY "group", u.i),
       |m AS (SELECT "group", d, sm // n AS mn, n FROM s),
       |g AS (SELECT "group", max(n) AS n, list(mn ORDER BY d) AS cent
       |      FROM m GROUP BY "group"),
       |z AS (SELECT "group", n, cent,
       |        list_aggregate(list_transform(cent, x -> x * x), 'sum') AS norm2
       |      FROM g)
       |SELECT "group", CAST(n AS BIGINT) AS n,
       |  list_aggregate(list_transform(cent, x -> CAST(x AS VARCHAR)),
       |                 'string_agg', ',') AS centroid_e3,
       |  list_aggregate(list_transform(cent,
       |    x -> CAST(CAST(CASE WHEN norm2 = 0 THEN 0
       |              ELSE floor(10000.0 * x / sqrt(CAST(norm2 AS DOUBLE))) END
       |         AS BIGINT) AS VARCHAR)), 'string_agg', ',') AS unit_e4
       |FROM z ORDER BY "group"""".stripMargin
}
