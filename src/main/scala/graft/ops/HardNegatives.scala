package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hard-negative mining for retrieval/embedding training: for each
  * training query, the most-similar corpus documents that are NOT
  * annotated positives. Random negatives are trivially separable;
  * the negatives that actually teach a bi-encoder are the near-misses
  * at the top of the ANN ranking — mine the query's top-k
  * neighborhood and subtract the qrels.
  *
  * Scale shape: one corpus pass for the whole query batch (C6b's
  * bounded per-partition combiner — only partitions × |queries| × k
  * rows reach the shuffle); qrels are queries × positives, broadcast
  * into the anti-join; the re-rank window partitions by query over
  * ≤ k rows each. Nothing here scales with corpus × queries.
  */
object HardNegatives {

  /** Top-`nNeg` hard negatives per query.
    *
    * @param corpus  (id, vec) document embeddings
    * @param queries columns query_id (bigint), qv (query embedding)
    * @param qrels   annotated positives, columns query_id, doc_id
    * @param k       neighborhood size mined per query (>= nNeg +
    *                expected positives, so the anti-join leaves
    *                enough candidates)
    * @return (query_id, vec_id, cos_sim, neg_rank), neg_rank 1..nNeg
    *         contiguous per query in (cos_sim DESC, vec_id) order
    */
  def mine(corpus: DataFrame, id: Column, vec: Column, queries: DataFrame,
      qrels: DataFrame, k: Int, nNeg: Int): DataFrame = {
    require(nNeg <= k, s"nNeg=$nNeg must be <= mined neighborhood k=$k")
    val topk = Similarity.bruteForceTopKBatch(corpus, id, vec, queries, k)
    val positives = qrels.select(col("query_id").cast("bigint").as("query_id"),
      col("doc_id").cast("bigint").as("vec_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    topk.join(broadcast(positives), Seq("query_id", "vec_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w).cast("bigint"))
      .filter(col("neg_rank") <= nNeg)
  }
}
