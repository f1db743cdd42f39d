package graft.gtfs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("co-bucketed tables join with zero exchanges") {
    val wh = Files.createTempDirectory("graft_bucketed")
    val orders = Tables.read(spark, "/root/testdata/sf0.001", "orders")
    val lineitem = Tables.read(spark, "/root/testdata/sf0.001", "lineitem")

    GtfsLake.writeBucketed(orders.withColumnRenamed("o_orderkey", "k"),
      "graft_orders_b", s"$wh/orders", "k", 4)
    GtfsLake.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "k"),
      "graft_lineitem_b", s"$wh/lineitem", "k", 4)
    try {
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"), "k")
        .groupBy("k").count()
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed scan feeds the join and the aggregation with no
      // shuffle at all: the write-time bucketing IS the partitioning
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"not a bucketed scan:\n$plan")
      // same join unbucketed shuffles both sides
      val unbucketed = orders.withColumnRenamed("o_orderkey", "k")
        .join(lineitem.withColumnRenamed("l_orderkey", "k"), "k")
        .groupBy("k").count()
      unbucketed.count()
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }

  test("date-partitioned write prunes partitions at the scan") {
    val out = Files.createTempDirectory("graft_partitioned").toString
    val events = Tables.read(spark, "/root/testdata/sf0.001", "events")
      .withColumn("event_date", to_date(col("ts")))
    GtfsLake.writePartitioned(events, out, "event_date")

    val oneDay = spark.read.parquet(out).filter(col("event_date") === "2024-01-02")
    oneDay.count()
    val scan = oneDay.queryExecution.executedPlan.toString
    // partition filter applied, and only a sliver of partitions read
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"), scan)
    val all = spark.read.parquet(out).select("event_date").distinct().count()
    assert(all > 5) // the table really is multi-partition
    val prunedRows = oneDay.count()
    val totalRows = spark.read.parquet(out).count()
    assert(prunedRows < totalRows / 5)

    // session writes parquet as zstd (codec is part of the file name)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
    val parts = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
      .map(_.getFileName.toString).filter(_.startsWith("part-")).toSeq
    assert(parts.nonEmpty && parts.forall(_.contains(".zstd.parquet")), parts.take(3))
  }

  test("runtime bloom-filter pruning engages on selective fact joins") {
    // thresholds lowered to simulate at-scale scan sizes (defaults
    // gate on 10GB application-side scans); at 100 TB the defaults
    // fire on exactly this plan shape
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.read(spark, "/root/testdata/sf0.001", "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val l = Tables.read(spark, "/root/testdata/sf0.001", "lineitem")
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_returnflag")).count()
      j.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter_agg"), s"no runtime bloom filter in:\n${plan.take(2000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev.getOrElse("10MB"))
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("approximate aggregates stay within error bounds of exact") {
    val events = Tables.read(spark, "/root/testdata/sf0.001", "events")
    val exact = events.select(countDistinct(col("user_id"))).first().getLong(0)
    val approx = events.select(approx_count_distinct(col("user_id"), 0.02)).first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"$approx vs $exact")
    val p50exact = events.stat.approxQuantile("value", Array(0.5), 0.0).head
    val p50approx = events.stat.approxQuantile("value", Array(0.5), 0.05).head
    assert(math.abs(p50approx - p50exact) < 0.2 * math.max(1.0, math.abs(p50exact)))
  }
}
