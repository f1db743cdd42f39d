package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data-skipping manifest — the Delta/Iceberg-style
  * pruning layer for predicates on NON-partition columns.
  *
  * Partition pruning (A26) only skips on the directory key, and
  * parquet row-group stats only prune after a task has already been
  * scheduled against the file. At 100 TB / millions of files the win
  * is skipping the FILE LIST: a manifest of per-file column ranges
  * lets the driver plan a scan over only the files whose [min, max]
  * can intersect the predicate — the same job parquet footers do, but
  * O(manifest scan) at plan time instead of O(files) footer reads and
  * task launches.
  *
  * Scale shape: the manifest build is one distributed pass
  * (`groupBy(input_file_name())` — partial-aggregated, one row per
  * file out); the manifest itself is one row per file (~10^6 rows at
  * 100 TB — parquet-scanned in a single task, or collected at the
  * driver as a metadata-sized list the way every table format's
  * planner does). Pruning composes with z-order (A35): clustered
  * layouts make per-file ranges tight, so a box predicate keeps only
  * the files it genuinely needs.
  */
object SkippingIndex {

  /** Per-file stats for `cols` over the parquet table at `path`:
    * (file, n_rows, <c>_min, <c>_max per column). One distributed
    * aggregation keyed by file name.
    */
  def stats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)

  /** Build and persist the manifest next to the table (a sibling
    * directory, so table readers never see it as data).
    */
  def writeManifest(spark: SparkSession, path: String, cols: Seq[String]): String = {
    val manifestPath = path.stripSuffix("/") + "_manifest"
    stats(spark, path, cols).coalesce(1)
      .write.mode("overwrite").parquet(manifestPath)
    manifestPath
  }

  /** Files whose [min, max] range for `column` intersects [lo, hi] —
    * the planned file list for a between-predicate scan.
    */
  def candidateFiles(spark: SparkSession, manifestPath: String, column: String,
      lo: Any, hi: Any): Seq[String] =
    spark.read.parquet(manifestPath)
      .filter(col(s"${column}_max") >= lit(lo) && col(s"${column}_min") <= lit(hi))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq

  /** Read only the files that can satisfy `lo <= column <= hi`,
    * re-applying the exact predicate on the survivors. Returns an
    * empty (schema-correct) frame when nothing can match.
    */
  def prunedRead(spark: SparkSession, path: String, manifestPath: String,
      column: String, lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(spark, manifestPath, column, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }
}
