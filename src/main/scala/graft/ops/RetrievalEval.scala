package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval evaluation metrics — the measurement side of a search /
  * RAG pipeline: given per-query ranked results and a relevance set
  * (qrels), compute recall@k, MRR and nDCG@k per query. Run after
  * every index build (C6/C7/C7b) or ranking change (C31 BM25) to
  * catch quality regressions the way unit tests catch logic ones.
  *
  * Determinism: positions are integers, so DCG terms are quantized
  * as `floor(1e6 / log2(pos + 1))` micro-units per relevant hit and
  * nDCG is the 4dp-rounded ratio of two integer sums — associative,
  * engine-portable (same device as NgramLm's micro-nats). Recall and
  * MRR are ratios of exact integers.
  *
  * Scale shape: one equi-join of rankings to qrels on (query, doc) —
  * both sides fixed-width keys; qrels broadcast when small — then
  * one partial-agg shuffle keyed by query. Per-query row counts are
  * bounded by k, so nothing here scales with corpus size; it scales
  * with |queries| × k, which is exactly what you want to fan out.
  */
object RetrievalEval {

  /** Micro-unit DCG gain for a 1-based rank: floor(1e6/log2(r+1)). */
  private def gainMicro(rank: Column): Column =
    floor(lit(1e6) / log2(rank.cast("double") + 1.0)).cast("bigint")

  /** Per-query metrics. `rankings`: (query_id, doc_id, rank) with
    * rank 1-based and ≤ k rows per query; `qrels`: (query_id,
    * doc_id) relevant pairs. Returns (query_id, n_relevant, n_hits,
    * recall_at_k, mrr, ndcg_at_k), queries with no qrels omitted
    * (undefined metrics), queries with qrels but no hits at 0.
    */
  def metrics(rankings: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    val r = rankings.select(col("query_id").cast("bigint").as("query_id"),
      col("doc_id").cast("bigint").as("doc_id"), col("rank").cast("bigint").as("rank"))
    // dedupe qrels: a duplicate (query, doc) relevant pair would
    // multiply join rows, inflating n_hits/dcg and pushing recall > 1
    val q = qrels.select(col("query_id").cast("bigint").as("query_id"),
      col("doc_id").cast("bigint").as("doc_id")).distinct()

    val rel = q.groupBy(col("query_id")).agg(count(lit(1)).as("n_relevant"))

    val hits = r.join(q, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("rank")).as("first_rank"),
        sum(gainMicro(col("rank"))).as("dcg_micro"))

    // ideal DCG: the first min(n_relevant, k) positions all relevant
    val idcg = rel.select(col("query_id"),
      aggregate(
        sequence(lit(1L), least(col("n_relevant"), lit(k.toLong))),
        lit(0L),
        (acc, i) => acc + gainMicro(i)).as("idcg_micro"))

    rel.join(idcg, "query_id")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_relevant"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_relevant"), 4)
          .as("recall_at_k"),
        coalesce(round(lit(1.0) / col("first_rank"), 4), lit(0.0)).as("mrr"),
        round(coalesce(col("dcg_micro"), lit(0L)).cast("double") / col("idcg_micro"), 4)
          .as("ndcg_at_k"))
  }

  /** DuckDB twin of [[metrics]] over relations `rankSql(query_id,
    * doc_id, rank)` and `qrelSql(query_id, doc_id)`; final relation
    * `reval`.
    */
  def metricsSql(rankSql: String, qrelSql: String, k: Int): String =
    s"""rr AS (SELECT CAST(query_id AS BIGINT) AS query_id,
       |              CAST(doc_id AS BIGINT) AS doc_id, CAST(rank AS BIGINT) AS rank
       |       FROM ($rankSql)),
       |qq AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, CAST(doc_id AS BIGINT) AS doc_id
       |       FROM ($qrelSql)),
       |rel AS (SELECT query_id, count(*) AS n_relevant FROM qq GROUP BY query_id),
       |hits AS (
       |  SELECT rr.query_id, count(*) AS n_hits, min(rank) AS first_rank,
       |    sum(CAST(floor(1e6 / log2(CAST(rank AS DOUBLE) + 1.0)) AS BIGINT)) AS dcg_micro
       |  FROM rr JOIN qq USING (query_id, doc_id)
       |  GROUP BY rr.query_id),
       |idcg AS (
       |  SELECT query_id,
       |    sum(CAST(floor(1e6 / log2(CAST(p.i AS DOUBLE) + 1.0)) AS BIGINT)) AS idcg_micro
       |  FROM rel, unnest(range(1, least(n_relevant, $k) + 1)) AS p(i)
       |  GROUP BY query_id),
       |reval AS (
       |  SELECT rel.query_id, CAST(rel.n_relevant AS BIGINT) AS n_relevant,
       |    CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       |    round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / rel.n_relevant, 4) AS recall_at_k,
       |    coalesce(round(1.0 / h.first_rank, 4), 0.0) AS mrr,
       |    round(CAST(coalesce(h.dcg_micro, 0) AS DOUBLE) / i.idcg_micro, 4) AS ndcg_at_k
       |  FROM rel JOIN idcg i USING (query_id) LEFT JOIN hits h USING (query_id))""".stripMargin
}
