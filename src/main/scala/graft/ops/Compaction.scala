package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

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
  * half-written table (the local-FS reduction of a table format's
  * atomic commit).
  */
object Compaction {

  /** Rewrite `path` so each output file is ~`targetFileBytes`.
    * Returns (filesBefore, filesAfter). No-op (returns unchanged
    * counts) when the table is already at or below the target count.
    */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val dataFiles = listDataFiles(Paths.get(path))
    val before = dataFiles.size
    val totalBytes = dataFiles.map(Files.size).sum
    val wanted = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (wanted >= before) return (before, before)

    val tmp = Paths.get(path + ".compacting")
    deleteRecursively(tmp)
    spark.read.parquet(path)
      .coalesce(wanted)
      .write.mode("overwrite").parquet(tmp.toString)

    val old = Paths.get(path + ".old")
    deleteRecursively(old)
    Files.move(Paths.get(path), old)
    Files.move(tmp, Paths.get(path))
    deleteRecursively(old)
    (before, listDataFiles(Paths.get(path)).size)
  }

  private def listDataFiles(dir: Path): Seq[Path] =
    if (!Files.exists(dir)) Seq.empty
    else Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toSeq

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).iterator().asScala
        .foreach(Files.delete)
}
