package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ThetaSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private lazy val lineitem =
    graft.Tables.read(spark, "/root/testdata/sf0.01", "lineitem").persist()

  test("estimate within error bound; exact below k") {
    val exact = lineitem.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    val est = lineitem.select(
      ThetaSketch.thetaEstimate(ThetaSketch.thetaSketch(col("l_orderkey")))).first().getLong(0)
    val err = math.abs(est - exact).toDouble / exact
    assert(err < 0.13, s"exact=$exact est=$est err=$err") // 4 sigma at k=1024

    // fewer distincts than k -> exact
    val small = (1 to 500).toDF("x")
    assert(small.select(
      ThetaSketch.thetaEstimate(ThetaSketch.thetaSketch(col("x")))).first().getLong(0) == 500L)
  }

  test("per-group sketches union to exactly the global sketch") {
    val global = lineitem.select(ThetaSketch.thetaSketch(col("l_orderkey")))
      .first().getAs[Array[Byte]](0)
    val unioned = lineitem.groupBy(col("l_returnflag"))
      .agg(ThetaSketch.thetaSketch(col("l_orderkey")).as("sk"))
      .select(ThetaSketch.thetaUnion(col("sk")))
      .first().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(global, unioned)) // k-minima lose nothing in merge
  }

  test("intersection estimate: exact for small disjoint/overlapping sets, sane at scale") {
    val a = (1 to 400).toDF("x").select(ThetaSketch.thetaSketch(col("x")).as("sk"))
      .first().getAs[Array[Byte]](0)
    val b = (201 to 600).toDF("x").select(ThetaSketch.thetaSketch(col("x")).as("sk"))
      .first().getAs[Array[Byte]](0)
    val c = (1000 to 1100).toDF("x").select(ThetaSketch.thetaSketch(col("x")).as("sk"))
      .first().getAs[Array[Byte]](0)
    assert(ThetaSketch.intersectEstimate(
      ThetaSketch.deserializeValues(a), ThetaSketch.deserializeValues(b), 1024) == 200L)
    assert(ThetaSketch.intersectEstimate(
      ThetaSketch.deserializeValues(a), ThetaSketch.deserializeValues(c), 1024) == 0L)

    // saturated sketches: orders appearing in lineitem both with and
    // without returns — estimate vs exact within a loose bound
    val withRet = lineitem.filter(col("l_returnflag") =!= "N")
    val noRet = lineitem.filter(col("l_returnflag") === "N")
    val skA = withRet.select(ThetaSketch.thetaSketch(col("l_orderkey"))).first().getAs[Array[Byte]](0)
    val skB = noRet.select(ThetaSketch.thetaSketch(col("l_orderkey"))).first().getAs[Array[Byte]](0)
    val est = withRet.select(col("l_orderkey")).intersect(noRet.select(col("l_orderkey"))).count()
    val got = lineitem.sparkSession.range(1).select(
      ThetaSketch.thetaIntersect(lit(skA), lit(skB))).first().getLong(0)
    assert(math.abs(got - est).toDouble / math.max(est, 1) < 0.3, s"exact=$est est=$got")
  }

  test("plan shows partial/merge object aggregation") {
    val plan = lineitem.groupBy(col("l_returnflag"))
      .agg(ThetaSketch.thetaSketch(col("l_orderkey")).as("sk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_graft_theta_sketch"),
      s"plan:\n$plan")
  }
}
