package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** ANN quality evaluation — recall@k of the IVF index against exact
  * brute force, the number every vector-search deployment reports:
  * nProbe trades latency against recall, and the right setting comes
  * from MEASURING recall on your own corpus and query load, not from
  * the index's theoretical pruning bound (a skewed cell layout —
  * C95's diagnostic — silently tanks recall at fixed nProbe).
  *
  * Scale shape: the exact side is one corpus pass through the
  * broadcast query (the C6 brute-force baseline); the IVF side is
  * the C7b probed search; both collapse to top-k row sets whose
  * intersection is a trivial join. At 100 TB this runs on a sampled
  * query set — the metric, not the serving path.
  */
object AnnEval {

  /** One row: (top_k, n_approx, n_hit, recall_milli) — the IVF
    * probed top-k measured against the exact brute-force top-k under
    * the identical (cosine DESC, vec_id) total order. `n_approx` can
    * fall short of top_k when the probed cells hold fewer vectors.
    */
  def ivfRecallAtK(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      query: DataFrame, // one row, column "qv"
      k: Int,
      iters: Int,
      nProbe: Int,
      topK: Int,
      scale: Long = 1000L): DataFrame = {
    val approx = IvfIndex
      .integerIvfTopK(corpus, id, vec, query, k, iters, nProbe, topK, scale)
      .select(col("vec_id"))
    val truth = corpus
      .select(id.cast("bigint").as("vec_id"), vec.as("v"))
      .crossJoin(broadcast(query.select(col("qv"))))
      .select(col("vec_id"),
        VectorFunctions.cosineSimilarity(col("v"), col("qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(topK)
      .select(col("vec_id"))
    recallRow(approx, truth, topK)
  }

  /** One aggregation over approx ⟕ truth (both ≤ topK rows): counting
    * rows and hits in the same pass evaluates the approx side — a
    * full index probe / corpus encode — ONCE, where the previous
    * two-singleton-agg + crossJoin shape re-ran it per aggregate.
    */
  private def recallRow(approx: DataFrame, truth: DataFrame, topK: Int): DataFrame =
    approx.join(broadcast(truth.withColumn("hit", lit(1))), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_approx"), count(col("hit")).as("n_hit"))
      .select(lit(topK.toLong).as("top_k"), col("n_approx"), col("n_hit"),
        floor(lit(1000.0) * col("n_hit") / topK).cast("bigint").as("recall_milli"))

  /** PQ recall@k — the quantization-loss twin of [[ivfRecallAtK]]:
    * the ADC top-k (ranked by sub-codebook quantized L2, C78's
    * serving path) measured against the EXACT top-k under the same
    * metric in the same quantized domain (integer L2 on the
    * floor(x·scale) vectors, no codebook). Holding the metric and
    * domain fixed isolates what PQ actually loses — the sub-codebook
    * approximation — which is the number that decides m and k before
    * shipping an index.
    */
  def pqRecallAtK(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      query: DataFrame, // one row, column "qv"
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      topK: Int): DataFrame = {
    val cb = PqIndex.fitCodebooks(corpus, id, vec, dim, m, k, iters)
    val codes = PqIndex.encode(corpus, id, vec, cb)
    val qv = query.select(col("qv").cast("array<double>")).head().getSeq[Double](0).toArray
    val approx = PqIndex.adcTopK(codes, qv, cb, topK).select(col("vec_id"))
    val truth = corpus
      .select(id.cast("bigint").as("vec_id"),
        IvfIndex.quantized(vec, cb.scale).as("v"))
      .crossJoin(broadcast(
        query.select(IvfIndex.quantized(col("qv"), cb.scale).as("qq"))))
      .select(col("vec_id"),
        graft.plans.SqDistLongExpr.sqDist(col("v"), col("qq")).as("d2"))
      .orderBy(col("d2"), col("vec_id"))
      .limit(topK)
      .select(col("vec_id"))
    recallRow(approx, truth, topK)
  }

  /** DuckDB twin fragment for [[pqRecallAtK]]: composes on
    * [[PqIndex.pqCtes]]' `pqtop`; final relation `pqrec`. The truth
    * side reads `embeddings` directly (corpus = vec_id <> 0, query =
    * vec_id 0 — the q_pq_topk fixture).
    */
  def pqRecallSql(topK: Int, dim: Int): String =
    s"""pqtruth AS (SELECT vid FROM (
       |  SELECT p.vid,
       |    list_aggregate(list_transform(range(1, ${dim + 1}),
       |      i -> (p.qv[i] - q.qv[i]) * (p.qv[i] - q.qv[i])), 'sum') AS d2
       |  FROM pq p CROSS JOIN pq0 q
       |  ORDER BY d2, vid LIMIT $topK)),
       |pqhit AS (SELECT t.vec_id FROM pqtop t
       |          WHERE EXISTS (SELECT 1 FROM pqtruth a WHERE a.vid = t.vec_id)),
       |pqrec AS (SELECT CAST($topK AS BIGINT) AS top_k,
       |            (SELECT count(*) FROM pqtop) AS n_approx,
       |            (SELECT count(*) FROM pqhit) AS n_hit,
       |            CAST(floor(1000.0 * (SELECT count(*) FROM pqhit) / $topK) AS BIGINT)
       |              AS recall_milli)""".stripMargin

  /** DuckDB twin fragment: composes on [[IvfIndex.integerIvfCtes]]'
    * `ivq` / `ivq0` / `ivtop`; final relation `anrec`.
    */
  def ivfRecallSql(topK: Int): String =
    s"""antruth AS (SELECT vid FROM (
       |  SELECT q.vid, list_cosine_similarity(q.v, q0.v) AS cs
       |  FROM ivq q CROSS JOIN ivq0 q0
       |  ORDER BY cs DESC, vid LIMIT $topK)),
       |anhit AS (SELECT t.vec_id FROM ivtop t
       |          WHERE EXISTS (SELECT 1 FROM antruth a WHERE a.vid = t.vec_id)),
       |anrec AS (SELECT CAST($topK AS BIGINT) AS top_k,
       |            (SELECT count(*) FROM ivtop) AS n_approx,
       |            (SELECT count(*) FROM anhit) AS n_hit,
       |            CAST(floor(1000.0 * (SELECT count(*) FROM anhit) / $topK) AS BIGINT)
       |              AS recall_milli)""".stripMargin
}
