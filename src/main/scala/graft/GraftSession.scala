package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every graft entrypoint needs:
  * AQE for runtime re-planning/skew handling, shuffle partitions sized
  * to local cores (not the 200 default), UTC session time zone for
  * oracle parity.
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // zstd beats snappy ~30% on size at comparable speed — at 100 TB
      // that is tens of TB of storage and shuffle-read I/O; page-level
      // column indexes (on by default in the writer) make point/range
      // predicates skip pages within row groups
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")

  def getOrCreate(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
