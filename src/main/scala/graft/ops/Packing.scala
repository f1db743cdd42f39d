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
}
