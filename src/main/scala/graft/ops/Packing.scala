package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated
  * into one token stream per shard and cut into fixed-size context
  * windows. Each document's chunk assignment is the window containing
  * its START offset — the standard concat-then-chunk packing, fully
  * determined by (shard, order, token counts), so it is reproducible
  * and exactly oracle-checkable.
  *
  * The running offset is a windowed prefix sum PARTITIONED BY SHARD —
  * each shard packs independently and in parallel; there is no global
  * sequential scan, which is what makes this shape hold at 100 TB
  * (shard = source/date/bucket; one shuffle on the shard key).
  */
object Packing {

  /** Assign each document its start offset and chunk id within its
    * shard's concatenated token stream.
    *
    * @param order   total order within a shard (e.g. doc id)
    * @param tokens  per-document token count
    * @param maxTokens context window size
    */
  def packChunks(
      df: DataFrame,
      shard: Column,
      order: Column,
      tokens: Column,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shard)
      .orderBy(order)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("start_offset", coalesce(sum(tokens).over(w), lit(0L)).cast("bigint"))
      .withColumn("chunk_id", floor(col("start_offset") / maxTokens).cast("bigint"))
  }

  /** Chunk-level summary: documents and tokens per context window —
    * the packing-efficiency view (windows whose token sum is far from
    * maxTokens indicate fragmentation).
    */
  def chunkStats(packed: DataFrame, shard: Column, tokens: Column): DataFrame =
    packed.groupBy(shard.as("shard"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens).cast("bigint").as("n_tokens"))

  /** Length-bucketed batch assembly — the inference/eval counterpart
    * of [[packChunks]]: documents are grouped into buckets of similar
    * token length (bucket width `bucketWidth`), padded to the bucket
    * ceiling, and batched so each batch's PADDED token volume stays
    * within `maxBatchTokens`. Within a bucket the padded length is
    * constant, so the batch is a fixed count of `maxBatchTokens /
    * ceiling` docs (min 1) and assignment is pure integer arithmetic
    * on a per-bucket rank — deterministic (hash order, id tiebreak),
    * exactly oracle-checkable, and one shuffle keyed by bucket; every
    * bucket batches independently in parallel.
    *
    * Returns the input's id/token columns plus (bucket, padded_len,
    * batch_id) where batch_id is per-bucket.
    */
  def lengthBatches(
      df: DataFrame,
      id: Column,
      tokens: Column,
      bucketWidth: Int,
      maxBatchTokens: Int): DataFrame = {
    require(bucketWidth > 0 && maxBatchTokens > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(Dedup.md5Hash60(col("doc_id").cast("string")), col("doc_id"))
    df.select(id.cast("bigint").as("doc_id"), tokens.cast("bigint").as("n_tokens"))
      // clamp to >= 1 token: n_tokens <= 0 would otherwise produce a
      // negative bucket here and a division-by-zero in the SQL twin
      .withColumn("bucket",
        floor((greatest(col("n_tokens"), lit(1L)) - 1) / bucketWidth).cast("bigint"))
      .withColumn("padded_len", (col("bucket") + 1) * bucketWidth)
      .withColumn("batch_size",
        greatest(lit(1L), floor(lit(maxBatchTokens.toLong) / col("padded_len")).cast("bigint")))
      .withColumn("batch_id",
        floor((row_number().over(w) - 1) / col("batch_size")).cast("bigint"))
      .select(col("doc_id"), col("n_tokens"), col("bucket"), col("padded_len"), col("batch_id"))
  }

  /** DuckDB twin of [[lengthBatches]] over a relation `table` with
    * columns (doc_id, n_tokens).
    */
  def lengthBatchesSql(table: String, bucketWidth: Int, maxBatchTokens: Int): String =
    s"""lb AS (
       |  SELECT doc_id, n_tokens,
       |    CAST((greatest(n_tokens, 1) - 1) // $bucketWidth AS BIGINT) AS bucket,
       |    CAST(((greatest(n_tokens, 1) - 1) // $bucketWidth + 1) * $bucketWidth AS BIGINT) AS padded_len
       |  FROM $table),
       |lbatch AS (
       |  SELECT doc_id, n_tokens, bucket, padded_len,
       |    CAST((row_number() OVER (PARTITION BY bucket
       |            ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
       |                     doc_id) - 1)
       |      // greatest(1, $maxBatchTokens // padded_len) AS BIGINT) AS batch_id
       |  FROM lb)""".stripMargin
}
