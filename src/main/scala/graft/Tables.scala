package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  * Plain parquet scans — filters/projections applied by callers push
  * down into the scan via Catalyst.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Naive parquet timestamps (ms) read as TIMESTAMP under the UTC
    // session (not NTZ) so timestamp functions apply uniformly. The
    // events table's `ts` has shipped as BOTH physical types across
    // testdata generations: TIMESTAMP(NANOS) — unreadable by Spark's
    // vectorized reader, surfaced as raw nanos under `nanosAsLong` —
    // and plain TIMESTAMP(MICROS). Normalize on the OBSERVED read
    // type, never an assumed one: raw nanos convert via integer `div`
    // (exact: nano values exceed 2^53, a double roundtrip would lose
    // microseconds), native timestamps pass through.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  // Last sfDir whose views were registered, per session: registration is
  // metadata-only but re-planning 10 reads per sql() call dominated small
  // statements (41x on q_sql_passthrough in round 1). Views are session-
  // global names, so the cache invalidates when the sfDir changes.
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every table as a temp view so `spark.sql` passthrough
    * statements see the same relation names the DuckDB oracle does.
    * Idempotent and cached per (session, sfDir). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    registeredDir.compute(spark, (_, prev) => {
      if (prev != sfDir) all.foreach(n => read(spark, sfDir, n).createOrReplaceTempView(n))
      sfDir
    })
}
