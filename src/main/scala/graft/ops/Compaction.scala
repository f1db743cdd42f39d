package graft.ops

import org.apache.spark.sql.SparkSession

import graft.util.StoreFs

/** Small-file compaction: the table-maintenance pass every
  * long-running ingest needs. Streaming appends (B9/B10) and
  * per-batch writes accumulate thousands of tiny parquet files;
  * at 100 TB that turns scans into metadata storms (one task + one
  * footer read per file) and crushes the driver's file index.
  *
  * The rewrite is shuffle-free: `coalesce` only CONCATENATES input
  * partitions into fewer output partitions (no repartitioning
  * exchange), so compaction cost is one sequential read + write of
  * the data. The rewrite lands in a temporary sibling directory and
  * is swapped in with two renames — readers never observe a
  * half-written table (the atomic-commit reduction of a table
  * format). All paths go through the Hadoop `FileSystem` of the
  * session conf ([[graft.util.StoreFs]]), so the same code compacts
  * `file:`, HDFS, or S3A tables.
  */
object Compaction {

  /** Rewrite `path` so each output file is ~`targetFileBytes`.
    * Returns (filesBefore, filesAfter). No-op (returns unchanged
    * counts) when the table is already at or below the target count.
    */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    recover(path)
    val dataFiles = listDataFiles(path)
    val before = dataFiles.size
    val totalBytes = dataFiles.map(_._2).sum
    val wanted = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (wanted >= before) return (before, before)

    val tmp = path + ".compacting"
    StoreFs.deleteRecursively(tmp)
    spark.read.parquet(path)
      .coalesce(wanted)
      .write.mode("overwrite").parquet(tmp)

    val old = path + ".old"
    StoreFs.deleteRecursively(old)
    StoreFs.rename(path, old)
    StoreFs.rename(tmp, path)
    StoreFs.deleteRecursively(old)
    (before, listDataFiles(path).size)
  }

  /** Heal the one non-atomic window in the swap: a compaction that
    * died between its two renames leaves the table at `path + ".old"`
    * and nothing at `path`. Restoring is a single rename; callers
    * that read the table directly should route through this first
    * (compact itself always does).
    */
  def recover(path: String): Unit =
    if (!StoreFs.exists(path) && StoreFs.exists(path + ".old"))
      StoreFs.rename(path + ".old", path)

  private def listDataFiles(dir: String): Seq[(String, Long)] =
    StoreFs.listFilesRecursive(dir).filter(_._1.endsWith(".parquet"))
}
