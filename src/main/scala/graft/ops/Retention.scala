package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-aware duplicate-cluster retention — the keep-policy step
  * that follows near-dup clustering: instead of C21's "keep the
  * minimum doc_id" (arbitrary), keep the HIGHEST-QUALITY member of
  * every duplicate cluster (ties broken by the smaller id, so the
  * policy is total and deterministic). This is how production corpus
  * dedup actually retains documents: the cluster representative is
  * chosen by a quality score (classifier logit, length, source
  * priority), not by insertion order.
  *
  * Scale shape: clustering is the C21 star-contraction path
  * (O(log n) rounds on any component shape); the winner per cluster
  * is a partial-aggregable `min(struct(-quality, doc_id))` — one
  * fixed-width shuffle keyed by cluster_id, no per-cluster window;
  * members then join their cluster's winner row (|clusters| rows) to
  * emit the keep flag.
  */
object Retention {

  /** (doc_id, cluster_id, quality, is_kept): every doc that appears
    * in `pairs` labeled with its component and whether it is the
    * component's retained representative — max quality, ties to the
    * smaller doc_id. `quality` must be (id, integer score); docs in
    * pairs but missing from `quality` participate with quality 0
    * (they can still win an all-missing cluster deterministically).
    */
  def keepBest(pairs: DataFrame, quality: DataFrame,
      qId: Column, qScore: Column): DataFrame = {
    val clusters = DupClusters.connectedComponentsStar(pairs)
    val q = quality.select(qId.cast("bigint").as("doc_id"),
      qScore.cast("bigint").as("quality"))
    val members = clusters.join(q, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        coalesce(col("quality"), lit(0L)).as("quality"))
    val winners = members
      .groupBy(col("cluster_id"))
      .agg(min(struct((-col("quality")).as("nq"), col("doc_id").as("i")))
        .as("w"))
      .select(col("cluster_id"), col("w.i").as("keep_id"))
    members.join(winners, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("quality"),
        (col("doc_id") === col("keep_id")).as("is_kept"))
  }

  /** DuckDB twin fragment: given CTEs `cl(doc_id, cluster_id)` (the
    * recursive-CTE component closure) and `qrel(doc_id, q)` already
    * in scope, final relation `ret(doc_id, cluster_id, quality,
    * is_kept)` with identical winner semantics (min over the
    * (-quality, doc_id) struct = max quality, ties to smaller id).
    */
  def keepBestSql: String =
    """rmem AS (SELECT cl.doc_id, cl.cluster_id,
      |           coalesce(qrel.q, 0) AS quality
      |         FROM cl LEFT JOIN qrel USING (doc_id)),
      |rwin AS (SELECT cluster_id,
      |           min(struct_pack(nq := -quality, i := doc_id)).i AS keep_id
      |         FROM rmem GROUP BY cluster_id),
      |ret AS (SELECT m.doc_id, m.cluster_id, m.quality,
      |          m.doc_id = w.keep_id AS is_kept
      |        FROM rmem m JOIN rwin w USING (cluster_id))""".stripMargin
}
