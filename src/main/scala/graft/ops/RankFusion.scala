package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way a
  * retrieval pipeline combines a lexical ranking (BM25, C31) with a
  * dense ranking (embedding ANN, C6) without score calibration:
  * ranks are scale-free, so rrf(d) = Σ_r 1/(k0 + rank_r(d)) fuses
  * rankers whose raw scores are incomparable. This is the "hybrid
  * search" step of every retrieval-augmented data pipeline.
  *
  * Determinism: each contribution is the exact integer
  * floor(1e9 / (k0 + rank)) — the fused score is a bigint sum, so
  * cross-engine ordering never hinges on float addition order.
  *
  * Scale shape: inputs are ALREADY top-k lists (|queries| × k rows,
  * tiny relative to the corpus they were mined from); the fusion is
  * one full-outer join on (query_id, doc_id) + one window over
  * per-query groups of <= 2k rows. The expensive work stays in the
  * upstream rankers, which have their own scale paths (C7/C7b/C78).
  */
object RankFusion {

  final val Scale = 1000000000L

  /** Fuse two rankings. Inputs: (query_id, doc_id, rank) with rank
    * 1-based. Returns (query_id, doc_id, lex_rank, dense_rank,
    * rrf_score, rk) — absent-from-a-list ranks emitted as 0, fused
    * rank by (rrf_score desc, doc_id), top `topK` per query.
    */
  def fuse(lexical: DataFrame, dense: DataFrame, k0: Int = 60, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def norm(df: DataFrame, rankName: String): DataFrame =
      df.select(col("query_id").cast("bigint").as("query_id"),
        col("doc_id").cast("bigint").as("doc_id"),
        col("rank").cast("bigint").as(rankName))
    // Union + max-groupBy, NOT a full-outer join: (query_id, doc_id)
    // is unique within each ranked list, so max() recovers exactly
    // the join's coalesce semantics (absent side stays 0) — while the
    // plan drops the join's broadcast exchange, which at bench scale
    // is a whole extra Spark job serialized before the fusion stage
    // and at real scale would ship one full ranked list to every
    // executor (|queries| × k rows can be millions of rows when the
    // query set is itself a corpus, e.g. margin-based bitext mining).
    val fused = norm(lexical, "lex_rank")
      .withColumn("dense_rank", lit(0L))
      .unionByName(norm(dense, "dense_rank").withColumn("lex_rank", lit(0L)))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("lex_rank")).as("lex_rank"),
        max(col("dense_rank")).as("dense_rank"))
      .withColumn("rrf_score",
        when(col("lex_rank") > 0, floor(lit(Scale) / (col("lex_rank") + k0)).cast("bigint"))
          .otherwise(lit(0L)) +
        when(col("dense_rank") > 0, floor(lit(Scale) / (col("dense_rank") + k0)).cast("bigint"))
          .otherwise(lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= topK)
  }
}
