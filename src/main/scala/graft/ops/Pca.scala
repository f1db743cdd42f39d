package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed power-iteration PCA (C138): the top principal
  * component of an embedding corpus — the "dominant semantic axis"
  * primitive behind embedding whitening, anisotropy diagnosis (is
  * the space collapsing toward one direction?), ABTT-style
  * common-component removal, and 1-D curriculum ordering, without
  * ever materializing a covariance matrix OR an n×dim driver matrix.
  *
  * Per iteration, v ← normalize(Σᵢ cᵢ·(cᵢ·v)) needs only ONE
  * distributed aggregation: the per-row dot (cᵢ·v) is a narrow map
  * against the iterate riding as a literal, and the dim weighted
  * sums are partial-agg citizens — the Mmr/KCenter closure-literal
  * round pattern, O(dim) driver state, no vector shuffle anywhere.
  *
  * Determinism (the SURVEY §4 discipline): vectors unit-quantize to
  * floor(u·1e4) ints (UnitQuantExpr); the mean is truncating integer
  * division (Scala `/` == DuckDB `//`); centered values, dots, and
  * weighted sums are EXACT integer arithmetic (decimal(38,0) sums —
  * HUGEINT on the twin — since Σ c·dot reaches ~5e19 at 2e5 rows);
  * normalization happens once per round on the 64 exact sums via
  * exactly-rounded IEEE ops in a FIXED left-to-right order, mirrored
  * literally by the twin's unrolled round CTEs. Sign is pinned by
  * the fixed all-positive start iterate.
  */
object Pca {

  /** Top principal component after `iters` power iterations.
    * @return (d, mu_q, pc1_e4): 1-based dimension index, the per-dim
    *         mean of the unit-quantized corpus (the centering
    *         vector), and the component in 1e-4 units.
    */
  def topComponent(
      df: DataFrame,
      vec: Column,
      dim: Int,
      iters: Int = 3): DataFrame = {
    require(dim >= 1 && iters >= 1, "dim and iters must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"

    val units = df.select(graft.plans.UnitQuantExpr.unitQuant(vec).as("__u"))
      .sharedPersist()

    // fixed all-positive start: floor(1e4/sqrt(dim)) per dim
    val v0: Array[Long] =
      Array.fill(dim)(math.floor(10000.0 / math.sqrt(dim.toDouble)).toLong)

    // FUSED mean + round 1 — one corpus pass instead of two. With
    // c = u − mu and dot = u·v0 − mu·v0, round 1's weighted sums
    // expand to the exact integer identity
    //   w1_d = Σ u_d(u·v0) − p·Σu_d − mu_d·Σ(u·v0) + n·mu_d·p
    // (p = mu·v0), so n, Σu_d, Σ(u·v0), and Σ u_d(u·v0) — all
    // partial-agg sums over the SAME scan — determine both the
    // centering vector and the first iterate. The twin keeps the
    // sequential mean→center→round form; the identity guarantees
    // identical integers.
    val dot0 = aggregate(
      zip_with(col("__u"), typedLit(v0.toSeq), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val fusedCols: Seq[Column] =
      sum(col("__d0").cast(dec)).as("t") +:
        (0 until dim).flatMap(d => Seq(
          sum(element_at(col("__u"), d + 1)).as(s"s$d"),
          sum((element_at(col("__u"), d + 1) * col("__d0")).cast(dec)).as(s"a$d")))
    val fused: Row = units.select(col("__u"), dot0.as("__d0"))
      .agg(count(lit(1)).as("__n"), fusedCols: _*)
      .head()
    val n = fused.getLong(0)
    require(n > 0, "empty corpus")
    val t = BigInt(fused.getDecimal(1).toBigInteger)
    val sArr = (0 until dim).map(d => fused.getLong(2 + 2 * d)).toArray
    val aArr = (0 until dim).map(d =>
      BigInt(fused.getDecimal(3 + 2 * d).toBigInteger)).toArray
    val mu: Array[Long] = sArr.map(_ / n)
    val p: Long = (0 until dim).map(d => mu(d) * v0(d)).sum

    // normalization: exact sums -> correctly-rounded doubles -> the
    // fixed-order IEEE fold the twin unrolls identically
    def normalize(w: Array[BigInt]): Array[Long] = {
      val wD = w.map(_.toDouble)
      val norm2 = wD.foldLeft(0.0)((acc, x) => acc + x * x)
      if (norm2 == 0.0) Array.fill(dim)(0L)
      else wD.map(x => math.floor(x / math.sqrt(norm2) * 10000.0).toLong)
    }

    var v: Array[Long] = normalize(
      (0 until dim).map(d =>
        aArr(d) - BigInt(p) * sArr(d) - BigInt(mu(d)) * t +
          BigInt(n) * mu(d) * p).toArray)

    val centered = units
      .select(zip_with(col("__u"), typedLit(mu.toSeq), (a, b) => a - b).as("__c"))
      .sharedPersist()
    for (_ <- 2 to iters) {
      val dot = aggregate(
        zip_with(col("__c"), typedLit(v.toSeq), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
      val wRow: Row = centered.select(col("__c"), dot.as("__dot"))
        .agg(
          sum((element_at(col("__c"), 1) * col("__dot")).cast(dec)).as("w0"),
          (1 until dim).map(d =>
            sum((element_at(col("__c"), d + 1) * col("__dot")).cast(dec)).as(s"w$d")): _*)
        .head()
      v = normalize((0 until dim).map(d =>
        BigInt(wRow.getDecimal(d).toBigInteger)).toArray)
    }

    (1 to dim).map(d => (d.toLong, mu(d - 1), v(d - 1)))
      .toDF("d", "mu_q", "pc1_e4")
  }

  /** Shared unit-quantization SQL (the UnitQuantExpr twin). */
  private def unitQSql: String =
    s"""list_transform(CAST(embedding AS DOUBLE[]), x ->
       |      CAST(CASE WHEN list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
       |                                                   y -> y * y), 'sum') = 0
       |           THEN 0
       |           ELSE floor(x / sqrt(list_aggregate(list_transform(
       |                  CAST(embedding AS DOUBLE[]), y -> y * y), 'sum')) * 10000)
       |           END AS BIGINT))""".stripMargin

  /** C146 ABTT anisotropy audit (Mu & Viswanath 2018, "All-but-the-
    * top"): how much of each group's centered variance lies along the
    * fitted common component — the collapse diagnostic that says
    * whether removing the top direction is worth it (a healthy
    * isotropic space scores ≈ 1/dim along any axis; an anisotropic
    * one concentrates). Per group: n, the mean signed projection
    * (drift of that group along the common axis, quantized units),
    * and the Rayleigh variance fraction in micro units —
    * `10⁶·Σ(c·v)² / (|v|²·Σ|c|²)` by truncating integer division
    * over DECIMAL(38,0) sums (exact; Σ(c·v)² overflows int64).
    *
    * Scale shape: ONE narrow corpus pass (mu and v ride as closure
    * literals, dots are per-row folds) into a group-keyed partial
    * agg; |v|² is a driver constant. Same budget as one power-
    * iteration round.
    */
  def anisotropyAudit(df: DataFrame, vec: Column, group: Column,
      mu: Array[Long], v: Array[Long]): DataFrame = {
    require(mu.length == v.length && mu.nonEmpty, "mu/v must be same nonzero dim")
    val dec = "decimal(38,0)"
    val vv: Long = v.map(x => x * x).sum
    val c = zip_with(graft.plans.UnitQuantExpr.unitQuant(vec),
      typedLit(mu.toSeq), (a, b) => a - b)
    val rows = df.select(group.cast("bigint").as("label"), c.as("__c"))
      .select(col("label"),
        aggregate(zip_with(col("__c"), typedLit(v.toSeq), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("dot"),
        aggregate(zip_with(col("__c"), col("__c"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("cn2"))
    rows.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("dot").cast(dec)).as("sd"),
        sum(col("dot").cast(dec) * col("dot").cast(dec)).as("sd2"),
        sum(col("cn2").cast(dec)).as("sc2"))
      .select(col("label"), col("n_vecs"),
        expr("CAST(sd DIV CAST(n_vecs AS DECIMAL(38,0)) AS BIGINT)").as("mean_dot_q"),
        when(col("sc2") > 0 && lit(vv) > 0,
          expr(s"CAST((CAST(1000000 AS DECIMAL(38,0)) * sd2) DIV " +
            s"(CAST($vv AS DECIMAL(38,0)) * sc2) AS BIGINT)"))
          .as("var_along_micro"))
      .orderBy(col("label"))
  }

  /** DuckDB twin tail for [[anisotropyAudit]] — appends to the
    * [[topComponentSql]] chain (needs `pml` and `prv<iters>`); final
    * relation `pani(label, n_vecs, mean_dot_q, var_along_micro)`.
    */
  def anisotropySqlTail(dim: Int, iters: Int = 3): String =
    s"""pusl AS (SELECT label, $unitQSql AS u FROM embeddings),
       |pcl AS (SELECT label, list_transform(range(1, ${dim + 1}),
       |          j -> u[CAST(j AS INT)] - mu[CAST(j AS INT)]) AS c
       |        FROM pusl, pml),
       |pvv AS (SELECT list_aggregate(list_transform(v, x -> x * x), 'sum') AS vv
       |        FROM prv$iters),
       |pdots AS (SELECT label,
       |    list_aggregate(list_transform(range(1, ${dim + 1}),
       |      j -> c[CAST(j AS INT)] * v[CAST(j AS INT)]), 'sum') AS dot,
       |    list_aggregate(list_transform(c, x -> x * x), 'sum') AS cn2
       |  FROM pcl, prv$iters),
       |pag AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       |    sum(CAST(dot AS HUGEINT)) AS sd,
       |    sum(CAST(dot AS HUGEINT) * dot) AS sd2,
       |    sum(CAST(cn2 AS HUGEINT)) AS sc2
       |  FROM pdots GROUP BY label),
       |pani AS (SELECT CAST(label AS BIGINT) AS label, n_vecs,
       |    CAST(sd // n_vecs AS BIGINT) AS mean_dot_q,
       |    CASE WHEN sc2 > 0 AND pvv.vv > 0
       |      THEN CAST((1000000 * sd2) // (CAST(pvv.vv AS HUGEINT) * sc2) AS BIGINT)
       |      END AS var_along_micro
       |  FROM pag, pvv)""".stripMargin

  /** DuckDB twin over `embeddings(embedding)`, `iters` unrolled
    * rounds; mirrors [[topComponent]] arithmetic literally.
    */
  def topComponentSql(dim: Int, iters: Int = 3): String = {
    val unitQ = unitQSql
    val v0 = math.floor(10000.0 / math.sqrt(dim.toDouble)).toLong
    val sb = new StringBuilder
    sb.append(
      s"""pus AS MATERIALIZED (SELECT $unitQ AS u FROM embeddings),
         |pmd AS MATERIALIZED (SELECT g.i AS d,
         |         sum(u[CAST(g.i AS INT)]) // count(*) AS mu
         |       FROM pus, unnest(range(1, ${dim + 1})) AS g(i)
         |       GROUP BY g.i),
         |pml AS (SELECT list(mu ORDER BY d) AS mu FROM pmd),
         |pcv AS MATERIALIZED (SELECT list_transform(range(1, ${dim + 1}),
         |         j -> u[CAST(j AS INT)] - mu[CAST(j AS INT)]) AS c
         |       FROM pus, pml),
         |prv0 AS (SELECT ${(0 until dim).map(_ => s"CAST($v0 AS BIGINT)")
              .mkString("list_value(", ", ", ")")} AS v),
         |""".stripMargin)
    for (r <- 1 to iters) {
      val wCols = (0 until dim)
        .map(d => s"CAST(sum(c[${d + 1}] * dot) AS HUGEINT) AS w$d")
        .mkString(",\n         ")
      val norm2 = (0 until dim)
        .map(d => s"CAST(w$d AS DOUBLE) * CAST(w$d AS DOUBLE)")
        .mkString(" + ")
      val vCols = (0 until dim).map(d =>
        s"CAST(CASE WHEN pn$r.norm2 = 0 THEN 0 ELSE floor(CAST(w$d AS DOUBLE) " +
          s"/ sqrt(pn$r.norm2) * 10000) END AS BIGINT)")
        .mkString("list_value(", ", ", ")")
      sb.append(
        s"""prw$r AS MATERIALIZED (
           |  SELECT $wCols
           |  FROM (SELECT c, list_aggregate(list_transform(range(1, ${dim + 1}),
           |          j -> c[CAST(j AS INT)] * v[CAST(j AS INT)]), 'sum') AS dot
           |        FROM pcv, prv${r - 1})),
           |pn$r AS (SELECT $norm2 AS norm2 FROM prw$r),
           |prv$r AS (SELECT $vCols AS v FROM prw$r, pn$r),
           |""".stripMargin)
    }
    sb.append(
      s"""pfin AS (SELECT CAST(pmd.d AS BIGINT) AS d,
         |           CAST(pmd.mu AS BIGINT) AS mu_q,
         |           CAST(v[CAST(pmd.d AS INT)] AS BIGINT) AS pc1_e4
         |         FROM pmd, prv$iters)""".stripMargin)
    sb.toString
  }
}
