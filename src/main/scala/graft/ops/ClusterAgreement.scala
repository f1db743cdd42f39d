package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-agreement metrics — exact Adjusted Rand Index between
  * two partitions of the same id set: did the re-fit IVF index
  * (C7b) shuffle its cells, does the dup-cluster closure (C21)
  * agree with the semantic-dedup cells (C54), do discovered
  * clusters track a metadata partition (lang/source)? The pair-
  * counting view makes agreement comparable across k and across
  * runs, chance-corrected — raw overlap is not.
  *
  * ARI = (C(n,2)·Σ_ij C(n_ij,2) − Σa·Σb)
  *     / (C(n,2)·(Σa+Σb)/2 − Σa·Σb)
  * with Σa/Σb the per-side pair sums. Everything is an integer pair
  * count; the single division is cross-multiplied into DECIMAL(38,0)
  * (Σa·Σb reaches (n²/2)² ≈ 1e23 at a million ids — past int64) and
  * emitted as floor-milli toward zero — ARI can be NEGATIVE (worse
  * than chance), and Spark's DIV truncates while DuckDB's // floors,
  * so the twin splits the sign explicitly. The denominator is >= 0
  * by AM-GM (Σa, Σb <= C(n,2)); zero means both partitions are
  * degenerate-identical → convention 1000. No decimal escapes the
  * schema (§4).
  *
  * Scale shape: one (cell_a, cell_b) partial-agg contingency
  * shuffle on the 8-byte id join, two |cells|-sized marginal aggs,
  * one scalar combine. Never materializes pairs.
  */
object ClusterAgreement {

  /** @param a (id, cell) first partition
    * @param b (id, cell) second partition (same id set)
    * @return one row: (n, cells_a, cells_b, sum_pairs_joint,
    *         sum_pairs_a, sum_pairs_b, ari_milli)
    */
  def ariMilli(a: DataFrame, b: DataFrame): DataFrame = {
    val la = a.select(col("id").cast("bigint").as("id"), col("cell").as("ca"))
    val lb = b.select(col("id").cast("bigint").as("id"), col("cell").as("cb"))
    val joint = la.join(lb, "id")
    val cont = joint.groupBy(col("ca"), col("cb")).agg(count(lit(1)).as("nij"))

    val sij = cont.agg(
      sum(expr("nij * (nij - 1) DIV 2")).as("sij"),
      sum(col("nij")).as("n"),
      countDistinct(col("ca")).as("cells_a"),
      countDistinct(col("cb")).as("cells_b"))
    val sa = cont.groupBy(col("ca")).agg(sum(col("nij")).as("ai"))
      .agg(sum(expr("ai * (ai - 1) DIV 2")).as("sa"))
    val sb = cont.groupBy(col("cb")).agg(sum(col("nij")).as("bj"))
      .agg(sum(expr("bj * (bj - 1) DIV 2")).as("sb"))

    val dec = "CAST(%s AS DECIMAL(38,0))"
    val c2n = s"(${dec.format("n")} * (n - 1) DIV 2)"
    // x2 clears the (sa+sb)/2: ari = 2(c2n*sij - sa*sb) / (c2n*(sa+sb) - 2*sa*sb)
    val num = s"(2 * (${dec.format(c2n)} * ${dec.format("sij")}" +
      s" - ${dec.format("sa")} * sb))"
    val den = s"(${dec.format(c2n)} * (${dec.format("sa")} + sb)" +
      s" - 2 * ${dec.format("sa")} * sb)"
    sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(col("n"), col("cells_a"), col("cells_b"),
        col("sij").as("sum_pairs_joint"),
        col("sa").as("sum_pairs_a"), col("sb").as("sum_pairs_b"),
        expr(s"CASE WHEN $den = 0 THEN 1000L " +
          s"ELSE CAST((1000 * $num) DIV $den AS BIGINT) END").as("ari_milli"))
  }

  /** DuckDB twin over CTEs `pa(id, cell)` / `pb(id, cell)`; emits
    * the WITH tail + final SELECT. The ari division truncates toward
    * zero on both engines: // floors in DuckDB, so the negative
    * branch negates through.
    */
  def ariSqlTail: String = {
    val c2n = "(CAST(n AS HUGEINT) * (n - 1) // 2)"
    val num = s"(1000 * 2 * ($c2n * sij - CAST(sa AS HUGEINT) * sb))"
    val den = s"($c2n * (sa + sb) - 2 * CAST(sa AS HUGEINT) * sb)"
    s"""cont AS (SELECT pa.cell AS ca, pb.cell AS cb, count(*) AS nij
       |         FROM pa JOIN pb USING (id) GROUP BY 1, 2),
       |sij AS (SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS sij,
       |          CAST(sum(nij) AS BIGINT) AS n,
       |          CAST(count(DISTINCT ca) AS BIGINT) AS cells_a,
       |          CAST(count(DISTINCT cb) AS BIGINT) AS cells_b
       |        FROM cont),
       |sa AS (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS sa
       |       FROM (SELECT CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY ca)),
       |sb AS (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS sb
       |       FROM (SELECT CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY cb))
       |SELECT n, cells_a, cells_b,
       |  sij AS sum_pairs_joint, sa AS sum_pairs_a, sb AS sum_pairs_b,
       |  CASE WHEN $den = 0 THEN 1000
       |       WHEN $num < 0 THEN CAST(-((-$num) // $den) AS BIGINT)
       |       ELSE CAST($num // $den AS BIGINT) END AS ari_milli
       |FROM sij, sa, sb""".stripMargin
  }
}
