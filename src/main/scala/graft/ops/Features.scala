package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashing-trick text featurization ("hashed bag-of-words"): token →
  * bucket = md5₆₀(token) mod dim, count per (doc, bucket). The
  * fixed-dimension, vocabulary-free feature map behind cheap linear
  * quality classifiers and DSIR-style importance models — no vocab
  * build pass, no OOV handling, and the feature space is identical
  * on every shard of a 100 TB corpus because the bucket is a pure
  * function of the token bytes.
  *
  * Scale shape: the whole histogram is computed IN-ROW by the
  * [[graft.plans.HashedBowExpr]] kernel (the grouping key of the
  * explode+groupBy formulation contained the row's own doc id, so
  * its exchange could never combine across rows — pure overhead);
  * sparse output is an explode of ≤ min(tokens, dim)-entry arrays,
  * dense output a per-doc map lookup over a `dim`-length sequence.
  * Nothing shuffles at any corpus size.
  */
object Features {

  /** Sparse hashed counts: (doc_id, bucket, cnt), bucket in [0, dim).
    *
    * In-row histogram (HashedBowExpr kernel) + explode — ZERO
    * shuffles. The grouped composition this replaces exchanged the
    * corpus token stream on (doc_id, bucket), a key containing the
    * row's own id: no cross-row combine can ever happen, so the
    * exchange was pure overhead on every classifier consumer
    * (bucket/cnt values bit-identical; HashedBowExprSpec pins it).
    */
  def hashedBow(df: DataFrame, id: Column, text: Column, dim: Int): DataFrame =
    df.select(id.cast("bigint").as("doc_id"),
        explode(graft.plans.HashedBowExpr.hashedBow(text, dim)).as("e"))
      .select(col("doc_id"), col("e.bucket").as("bucket"), col("e.cnt").as("cnt"))

  /** Dense per-doc feature vector: (doc_id, fvec array<bigint>) of
    * length `dim`, zeros for empty buckets — one narrow map off the
    * same in-row histogram (no groupBy: the entries are already
    * per-document).
    */
  def hashedBowVec(df: DataFrame, id: Column, text: Column, dim: Int): DataFrame =
    df.select(id.cast("bigint").as("doc_id"),
        map_from_entries(graft.plans.HashedBowExpr.hashedBow(text, dim)).as("m"))
      .filter(size(map_keys(col("m"))) > 0) // token-less docs were absent before (explode dropped them)
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i.cast("bigint")), lit(0L))).as("fvec"))

  /** DuckDB twin of the bucket hash (md5₆₀ mod dim, both non-negative). */
  def bucketSql(tok: String, dim: Int): String =
    s"CAST(('0x' || substr(md5($tok), 1, 15)) AS BIGINT) % $dim"
}
