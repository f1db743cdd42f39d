package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-epoch training order: every epoch gets its own
  * pseudo-random permutation of the corpus (seeded by the epoch
  * number — same corpus, same epochs, same order on any cluster),
  * cut into `nShards` contiguous, near-equal data-loader shards.
  * This is the "shuffle each epoch, then shard across loader
  * workers" step every training run performs, materialized as a
  * table instead of an in-memory shuffle buffer.
  *
  * Position is the exact rank of the row's epoch-seeded 60-bit hash.
  * The naive formulation — row_number() PARTITIONED BY epoch — puts
  * an entire epoch through ONE task; here rank is computed with the
  * distributed prefix device: the hash is uniform in [0, 2^60), so
  * its top bits are a balanced coarse range key; per-(epoch, range)
  * counts prefix-sum in a tiny window (epochs × [[HashRanges]]
  * rows), offsets broadcast back, and within-range ranks are
  * range-partitioned. Shard boundaries are pure integer arithmetic
  * on the position — shard sizes differ by at most one.
  *
  * Unlike [[Sampling.assignSplit]] this order is intentionally NOT
  * growth-stable: adding documents re-ranks an epoch (training order
  * is re-drawn per run anyway); split assignment stays the hash-
  * bucketed operator.
  */
object EpochShuffle {

  /** Coarse hash-range count for the distributed rank. */
  final val HashRanges = 256

  private val RangeWidth: Long = Sampling.HashSpace / HashRanges

  /** Epoch-seeded permutation + contiguous shards.
    *
    * @return (epoch, doc_id, position, shard, pos_in_shard): position
    *         is the 0-based rank in the epoch's order; shard s covers
    *         positions [ceil(s·n/nShards), ceil((s+1)·n/nShards)).
    */
  def shuffle(df: DataFrame, id: Column, epochs: Seq[Int], nShards: Int): DataFrame = {
    require(epochs.nonEmpty && nShards >= 1)
    val session = df.sparkSession
    import session.implicits._
    val epochDf = epochs.toDF("epoch")
    val rows = df.select(id.cast("bigint").as("doc_id"))
      .crossJoin(broadcast(epochDf))
      .withColumn("hkey",
        Dedup.md5Hash60(concat(col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))))
      .withColumn("coarse", expr(s"hkey DIV ${RangeWidth}L"))

    val wOff = Window.partitionBy(col("epoch")).orderBy(col("coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy(col("epoch"), col("coarse"))
      .agg(count(lit(1)).as("cs"))
      .withColumn("offset", coalesce(sum(col("cs")).over(wOff), lit(0L)))
      .select(col("epoch"), col("coarse"), col("offset"))

    val wIn = Window.partitionBy(col("epoch"), col("coarse"))
      .orderBy(col("hkey"), col("doc_id"))

    val n = df.select(id).agg(count(lit(1)).as("n"))
    rows.join(broadcast(offsets), Seq("epoch", "coarse"))
      .withColumn("position",
        col("offset") + row_number().over(wIn).cast("bigint") - lit(1L))
      .crossJoin(broadcast(n))
      // position·nShards < n·nShards — overflow only past n ≥ 2^63/S
      .withColumn("shard", expr(s"(position * ${nShards}L) DIV n"))
      .withColumn("pos_in_shard",
        expr(s"position - (shard * n + ${nShards}L - 1L) DIV ${nShards}L"))
      .select(col("epoch"), col("doc_id"), col("position"),
        col("shard").cast("int").as("shard"), col("pos_in_shard"))
  }
}
