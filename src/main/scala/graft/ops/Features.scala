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
  * Scale shape: one tokenize + explode, then a partial-agg count on
  * the fixed-width (doc_id, bucket) key — map-side combine collapses
  * each document's repeated tokens before the shuffle. The dense
  * assembly is a per-doc map lookup over a `dim`-length sequence, a
  * narrow map after the count.
  */
object Features {

  private def tokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)

  /** Sparse hashed counts: (doc_id, bucket, cnt), bucket in [0, dim). */
  def hashedBow(df: DataFrame, id: Column, text: Column, dim: Int): DataFrame =
    df.select(id.cast("bigint").as("doc_id"), explode(tokens(text)).as("tok"))
      .select(col("doc_id"), (Dedup.md5Hash60(col("tok")) % dim).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Dense per-doc feature vector: (doc_id, fvec array<bigint>) of
    * length `dim`, zeros for empty buckets.
    */
  def hashedBowVec(df: DataFrame, id: Column, text: Column, dim: Int): DataFrame =
    hashedBow(df, id, text, dim)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("cnt")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i.cast("bigint")), lit(0L))).as("fvec"))

  /** DuckDB twin of the bucket hash (md5₆₀ mod dim, both non-negative). */
  def bucketSql(tok: String, dim: Int): String =
    s"CAST(('0x' || substr(md5($tok), 1, 15)) AS BIGINT) % $dim"
}
