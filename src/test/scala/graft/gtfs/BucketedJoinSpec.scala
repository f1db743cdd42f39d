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
}
