package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-agreement metrics between two retrieval arms (lexical vs
  * dense, old index vs new, A/B rankers): per query,
  *
  *  - overlap@k (share of items both arms retrieve),
  *  - Kendall tau-b over the common items (order agreement),
  *  - rank-biased overlap lower bound (RBO_min, Webber et al. '10 —
  *    top-weighted agreement: disagreement at rank 1 costs more than
  *    at rank k).
  *
  * The eval-side complement of C106 RRF (which FUSES the two arms;
  * this MEASURES how much they agree — you watch it to decide
  * whether a cheap arm can replace an expensive one, or whether an
  * index rebuild changed results).
  *
  * Determinism: ranks are exact integers; tau counts
  * concordant/discordant pairs over ≤ k common items (≤ k²/2 pairs
  * per query — bounded); RBO's geometric weights are PRE-QUANTIZED
  * driver-side to micro literals (floor((1−p)p^(d−1)·1e6)) and
  * embedded identically in the Spark plan and the SQL twin, so no
  * engine ever evaluates pow() — the one non-exactly-rounded IEEE op
  * is kept out of both plans.
  *
  * Scale shape: everything after the two rank inputs is keyed by
  * query_id (partial-agg or ≤k-row-per-query joins); the depth table
  * is a k-row literal broadcast.
  */
object RankAgreement {

  /** Geometric RBO weights w_d = floor((1−p)·p^(d−1)·1e6), d=1..k. */
  def rboWeightsMicro(k: Int, pMilli: Int): Seq[Long] = {
    val p = pMilli / 1000.0
    (1 to k).map(d => math.floor((1.0 - p) * math.pow(p, d - 1) * 1e6).toLong)
  }

  /** @param a (query_id, doc_id, rank) — arm A, ranks 1..k per query
    * @param b same for arm B
    * @return (query_id, n_common, overlap_k_milli, tau_milli,
    *         rbo_micro); tau null when < 2 common items
    */
  def agreement(
      a: DataFrame,
      b: DataFrame,
      k: Int,
      pMilli: Int = 900): DataFrame = {
    require(k >= 1 && pMilli > 0 && pMilli < 1000, "k>=1, pMilli in (0,1000)")
    val ra = a.select(col("query_id"), col("doc_id"), col("rank").as("ra"))
    val rb = b.select(col("query_id"), col("doc_id"), col("rank").as("rb"))
    val common = ra.join(rb, Seq("query_id", "doc_id"))

    // ONE aggregation computes all three metrics: the common set is
    // ≤ k items per query BY CONSTRUCTION (each arm emits ranks
    // 1..k), so a per-query rank-pair array is bounded at k structs
    // and the tau pair loop at k² in-row ops — the former
    // join-per-metric tail (pair self-join + depth join + three
    // groupBys + two left joins) was six sequential shuffle stages
    // over ≤ k·|queries| rows, pure scheduling floor at any SF.
    //
    // Determinism: every expression below is a symmetric function of
    // the array MULTISET (tau counts ordered pairs x≠y and the
    // concordance test is order-symmetric; RBO sums a per-element
    // predicate), so collect_list's nondeterministic order cannot
    // leak into the output.
    val weights = rboWeightsMicro(k, pMilli)
    val wArr = weights.map(w => s"${w}L").mkString("array(", ", ", ")")
    // ordered concordant pairs (x ≠ y; x = y contributes 0): 2·nc
    val conc2 =
      """aggregate(pr, 0L, (acc, x) ->
        |  acc + aggregate(pr, 0L, (a2, y) ->
        |    a2 + if((x.ra - y.ra) * (x.rb - y.rb) > 0, 1L, 0L)))""".stripMargin
    // np = n(n-1)/2 unordered pairs; tau = (2nc − np)·1000 div np
    val np = "((cast(size(pr) as bigint) * (size(pr) - 1)) div 2)"
    common
      .groupBy(col("query_id"))
      .agg(collect_list(struct(col("ra"), col("rb"))).as("pr"))
      .select(col("query_id"),
        size(col("pr")).cast("bigint").as("n_common"),
        expr(s"cast(size(pr) as bigint) * 1000 div $k").as("overlap_k_milli"),
        when(size(col("pr")) >= 2,
          expr(s"(($conc2) - $np) * 1000 div $np")).as("tau_milli"),
        // RBO_min: overlap_d = |{m = max(ra, rb) <= d}|;
        // rbo = sum_d floor(w_d·overlap_d / d) — w_d pre-quantized
        // micro literals, embedded identically in the SQL twin
        expr(
          s"""aggregate(sequence(1, $k), 0L, (acc, d) ->
             |  acc + (element_at($wArr, d) *
             |    size(filter(pr, x -> greatest(x.ra, x.rb) <= d))) div d)""".stripMargin)
          .as("rbo_micro"))
  }

  /** DuckDB twin tail: expects `rla(query_id, doc_id, rank)` and
    * `rlb(query_id, doc_id, rank)` in scope; final relation
    * `ragr(query_id, n_common, overlap_k_milli, tau_milli,
    * rbo_micro)`.
    */
  def agreementSqlTail(k: Int, pMilli: Int = 900): String = {
    val wRows = rboWeightsMicro(k, pMilli).zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    s"""rcm AS (SELECT a.query_id, a.doc_id, a.rank AS ra, b.rank AS rb
       |        FROM rla a JOIN rlb b USING (query_id, doc_id)),
       |rbs AS (SELECT query_id, count(*) AS n_common FROM rcm GROUP BY query_id),
       |rpr AS (SELECT x.query_id,
       |          count(*) AS np,
       |          sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0 THEN 1 ELSE 0 END) AS nc
       |        FROM rcm x JOIN rcm y
       |          ON x.query_id = y.query_id AND x.doc_id < y.doc_id
       |        GROUP BY x.query_id),
       |rta AS (SELECT query_id, (2 * nc - np) * 1000 // np AS tau_milli FROM rpr),
       |rwt(d, w) AS (VALUES $wRows),
       |rmm AS (SELECT query_id, greatest(ra, rb) AS m, count(*) AS nm
       |        FROM rcm GROUP BY 1, 2),
       |rov AS (SELECT query_id, t.d, t.w, sum(nm) AS ov
       |        FROM rmm JOIN rwt t ON rmm.m <= t.d
       |        GROUP BY 1, 2, 3),
       |rrb AS (SELECT query_id, sum(w * ov // d) AS rbo_micro
       |        FROM rov GROUP BY query_id),
       |ragr AS (SELECT b.query_id, CAST(b.n_common AS BIGINT) AS n_common,
       |           CAST(b.n_common * 1000 // $k AS BIGINT) AS overlap_k_milli,
       |           CAST(t.tau_milli AS BIGINT) AS tau_milli,
       |           CAST(coalesce(r.rbo_micro, 0) AS BIGINT) AS rbo_micro
       |         FROM rbs b
       |         LEFT JOIN rta t USING (query_id)
       |         LEFT JOIN rrb r USING (query_id))""".stripMargin
  }
}
