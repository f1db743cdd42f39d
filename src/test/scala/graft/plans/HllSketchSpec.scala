package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class HllSketchSpec extends AnyFunSuite with SparkTestBase {

  private lazy val lineitem =
    graft.Tables.read(spark, "/root/testdata/sf0.01", "lineitem").persist()

  test("hll estimate is within the precision error bound of exact distinct") {
    val exact = lineitem.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    val est = lineitem.select(HllSketch.hllDistinct(col("l_orderkey"))).first().getLong(0)
    // p=12 -> sigma = 1.04/sqrt(4096) = 1.6%; 4 sigma = 6.5%
    val err = math.abs(est - exact).toDouble / exact
    assert(err < 0.065, s"exact=$exact est=$est err=$err")
  }

  test("per-group sketches union to exactly the global sketch (mergeable)") {
    val global = lineitem.select(HllSketch.hllSketch(col("l_orderkey")))
      .first().getAs[Array[Byte]](0)
    // build one sketch per return-flag group, then union the sketches:
    // register-exact equality with the single global sketch — merge
    // loses nothing, so sketches can be built incrementally (per day,
    // per source) and combined later
    val unioned = lineitem
      .groupBy(col("l_returnflag"))
      .agg(HllSketch.hllSketch(col("l_orderkey")).as("sk"))
      .select(HllSketch.hllUnion(col("sk")))
      .first().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(global, unioned))
  }

  test("sketches persist to parquet and estimate after reread (persistable)") {
    val dir = java.nio.file.Files.createTempDirectory("hll").toString + "/sk"
    lineitem.groupBy(col("l_returnflag"))
      .agg(HllSketch.hllSketch(col("l_orderkey")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val re = spark.read.parquet(dir)
    val est = re.select(HllSketch.hllEstimate(HllSketch.hllUnion(col("sk")))).first().getLong(0)
    val exact = lineitem.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.065)
    // per-group estimates work directly on the stored binary
    val perGroup = re.select(col("l_returnflag"), HllSketch.hllEstimate(col("sk")).as("n"))
    assert(perGroup.collect().forall(_.getLong(1) > 0))
  }

  test("plan shows partial/merge aggregation — registers cross the exchange, not rows") {
    val df = lineitem.groupBy(col("l_returnflag"))
      .agg(HllSketch.hllSketch(col("l_orderkey")).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial stage below the exchange and a merge stage above it
    assert(plan.contains("ObjectHashAggregate"), s"plan:\n$plan")
    assert(plan.contains("partial_graft_hll_sketch"), s"plan:\n$plan")
    assert(plan.contains("graft_hll_sketch"), s"plan:\n$plan")
  }

  test("sql registration: sketch, union, estimate usable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    lineitem.createOrReplaceTempView("hll_lineitem")
    val est = spark.sql(
      """SELECT graft_hll_estimate(graft_hll_union(sk)) AS n FROM (
        |  SELECT l_returnflag, graft_hll_sketch(l_orderkey) AS sk
        |  FROM hll_lineitem GROUP BY l_returnflag)""".stripMargin)
      .first().getLong(0)
    val exact = lineitem.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.065)
  }

  test("pre-hashed sketch estimates agree with the internally-hashed sketch") {
    val exact = lineitem.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    val est = lineitem.select(HllSketch.hllEstimate(
        HllSketch.hllSketchPreHashed(
          graft.ops.Dedup.md5Hash60(col("l_orderkey").cast("string")))))
      .first().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.065, s"exact=$exact est=$est")
  }

  test("small-range linear counting is near-exact for tiny cardinalities") {
    import spark.implicits._
    val tiny = (1 to 100).toDF("x")
    val est = tiny.select(HllSketch.hllDistinct(col("x"))).first().getLong(0)
    assert(math.abs(est - 100) <= 2, s"est=$est")
  }
}
