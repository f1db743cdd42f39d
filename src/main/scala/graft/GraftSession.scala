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
      // the iterative graph ops (LabelProp, DupClusters, KCore) cache
      // their static edge side PRE-PARTITIONED by the round-join key so
      // rounds shuffle only the (node, label) pairs; without this flag
      // AQE must preserve the cached plan's exact output partitioning,
      // so the cached repartition pins spark.sql.shuffle.partitions
      // tiny tasks at ANY data size — with it, the cached exchange is
      // coalesced like every other one (scale-adaptive: few partitions
      // locally, wide on a cluster), and every consumer join still
      // reuses the cached partitioning
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // zstd beats snappy ~30% on size at comparable speed — at 100 TB
      // that is tens of TB of storage and shuffle-read I/O; page-level
      // column indexes (on by default in the writer) make point/range
      // predicates skip pages within row groups
      .config("spark.sql.parquet.compression.codec", "zstd")
      // every graft TypedImperativeAggregate (top-k, HLL/theta/CMS/
      // quantile sketches) runs through ObjectHashAggregate, whose
      // DEFAULT hash-map capacity is 128 keys per task before it
      // silently degrades to sort-based aggregation — i.e. any
      // sketch/top-k groupBy with >128 groups per task paid a full
      // sort. Graft buffers are bounded by construction (k-element
      // heaps, fixed-width sketch registers ≤ a few KB), so 64k keys
      // per task is ≤ tens of MB — raise the fallback accordingly;
      // beyond that the sort fallback is the right spill behavior.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      // RocksDB is the DEFAULT streaming state store: the HDFS-backed
      // provider keeps every live key on-heap per executor, which caps
      // realtime state (latest-entity maps, session windows, dedup
      // sets) at executor heap; RocksDB spills to local disk with
      // changelog checkpointing, the production setting for unbounded
      // key spaces. Tests may still opt out per-session via
      // RealtimeStateStream.useDefaultStateStore.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false")

  def getOrCreate(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
