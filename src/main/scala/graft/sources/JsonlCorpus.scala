package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (JSON-lines) corpus source/sink — the interchange format of
  * LLM training corpora (every public text dataset ships as sharded
  * .jsonl[.gz]). Reading declares an explicit schema (never infer:
  * schema inference is a full extra pass over 100 TB and type-drifts
  * on dirty shards) and quarantines undecodable lines instead of
  * failing the job or silently dropping them — at corpus scale there
  * is ALWAYS a malformed shard, and a quarantine table makes the
  * loss auditable.
  *
  * Scale shape: line-delimited JSON splits by newline, so Spark
  * parallelizes WITHIN large files (unlike multiLine JSON — one file
  * one task); gzip shards parallelize per file. Writes go through
  * `maxRecordsPerFile` to bound shard sizes for downstream loaders.
  */
object JsonlCorpus {

  final val CorruptCol = "_corrupt_record"

  /** Read JSONL under `path` with the given schema. Returns the
    * decoded frame; rows that failed to parse carry the raw line in
    * [[CorruptCol]] and nulls elsewhere (PERMISSIVE mode — the
    * schema is extended with the corrupt column).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Clean rows only (corrupt column dropped). */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema).filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine: raw undecodable lines, for audit/repair.
    * Implemented over a text scan + `from_json` with a PERMISSIVE
    * corrupt-record field rather than filtering the json-reader
    * frame: Spark disallows queries that reference only the internal
    * corrupt-record column of a scan.
    */
  def readCorrupt(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add(StructField(CorruptCol, StringType, nullable = true))
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    spark.read.text(path)
      .select(col("value"),
        from_json(col("value"), withCorrupt, opts).getField(CorruptCol).as("bad"))
      .filter(col("bad").isNotNull)
      .select(col("value").as(CorruptCol))
  }

  /** Write `df` as JSONL shards of at most `maxRecordsPerFile` rows
    * (0 = Spark's default sizing).
    */
  def write(df: DataFrame, path: String, maxRecordsPerFile: Int = 0): Unit = {
    val w = df.write.mode("overwrite")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile.toLong) else w)
      .json(path)
  }

  /** Schema-evolved parquet corpus read: shards written before a
    * column existed surface it as NULL, and the union schema comes
    * from footer merge (`mergeSchema`), not inference over data. The
    * corpus-versioning contract: adding a metadata column (a new
    * quality score, a license flag) must never force a rewrite of
    * historical shards — readers see one table across generations.
    * Pass the shard directories explicitly (generation roots), or a
    * glob; schema merging is a footer-only pass, parallelized by
    * Spark, not a data scan.
    */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
