package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree assortativity of the dup-candidate graph (Newman 2002,
  * "Assortative mixing in networks"): the Pearson correlation of
  * endpoint degrees over edges. r > 0 — high-degree docs pair with
  * high-degree docs (a near-dup "hub mesh": template families,
  * mirror clusters); r < 0 — hubs pair with leaves (star shapes: one
  * boilerplate page matching everything, the classic spurious-anchor
  * signature that C109's k-core peels away). Alongside C140
  * (partition quality) and C105 (local clustering), this is the
  * third structural health check a 100 TB dedup graph gets before
  * its clusters are trusted.
  *
  * Exactness contract: with both edge orientations counted
  * (M = 2·edges), r = (M·Σjk − (Σj)²) / (M·Σj² − (Σj)²) where j, k
  * are endpoint degrees per directed edge. All sums accumulate as
  * DECIMAL(38,0) (the A43 integer moment-sum device) — associative,
  * order-independent, engine-exact; only the final ratio is a
  * double, rounded 4dp, NULL for a degree-regular graph (zero
  * denominator).
  *
  * Scale shape: one degree count (keyed shuffle), two degree-attach
  * joins on the directed edge list, ONE global partial agg to a
  * single row. Nothing quadratic, no windows, no driver state.
  */
object Assortativity {

  /** One row: (n_nodes, n_edges, assortativity) over an undirected
    * (src, dst) pair list. The moment sums stay internal DECIMALs —
    * the §4 oracle rule forbids decimal output columns, and at scale
    * the raw sums overflow BIGINT anyway.
    */
  def global(edges: DataFrame): DataFrame = {
    val e = edges
      .select(col("src").cast("bigint").as("a"), col("dst").cast("bigint").as("b"))
      .sharedPersist()
    val und = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val joined = und
      .join(deg.select(col("node").as("a"), col("deg").as("dj")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("dk")), Seq("b"))
    joined.agg(
        count(lit(1)).as("m2"),
        sum(dec(col("dj")) * dec(col("dk"))).as("sum_jk"),
        sum(dec(col("dj"))).as("sum_j"),
        sum(dec(col("dj")) * dec(col("dj"))).as("sum_j2"))
      .select(
        (col("m2") / 2).cast("bigint").as("n_edges"),
        when(dec(col("m2")) * col("sum_j2") - col("sum_j") * col("sum_j") =!= dec(lit(0)),
          round((dec(col("m2")) * col("sum_jk") - col("sum_j") * col("sum_j")).cast("double") /
            (dec(col("m2")) * col("sum_j2") - col("sum_j") * col("sum_j")).cast("double"), 4))
          .as("assortativity"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
      .select(col("n_nodes"), col("n_edges"), col("assortativity"))
  }

  /** DuckDB twin tail — expects `ed(a, b)` in scope; final relation
    * `asst(n_nodes, n_edges, assortativity)`.
    */
  def globalSqlTail: String =
    s"""aund AS (SELECT a, b FROM ed UNION ALL SELECT b AS a, a AS b FROM ed),
       |adeg AS (SELECT a AS node, count(*) AS deg FROM aund GROUP BY a),
       |asums AS (SELECT count(*) AS m2,
       |    sum(CAST(dj.deg AS DECIMAL(38,0)) * CAST(dk.deg AS DECIMAL(38,0))) AS sum_jk,
       |    sum(CAST(dj.deg AS DECIMAL(38,0))) AS sum_j,
       |    sum(CAST(dj.deg AS DECIMAL(38,0)) * CAST(dj.deg AS DECIMAL(38,0))) AS sum_j2
       |  FROM aund u
       |  JOIN adeg dj ON dj.node = u.a
       |  JOIN adeg dk ON dk.node = u.b),
       |asst AS (SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM adeg) AS n_nodes,
       |    CAST(m2 / 2 AS BIGINT) AS n_edges,
       |    CASE WHEN CAST(m2 AS DECIMAL(38,0)) * sum_j2 - sum_j * sum_j <> 0
       |      THEN round(CAST(CAST(m2 AS DECIMAL(38,0)) * sum_jk - sum_j * sum_j AS DOUBLE)
       |        / CAST(CAST(m2 AS DECIMAL(38,0)) * sum_j2 - sum_j * sum_j AS DOUBLE), 4)
       |      END AS assortativity
       |  FROM asums)""".stripMargin
}
