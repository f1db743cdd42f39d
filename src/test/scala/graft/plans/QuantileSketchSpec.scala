package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class QuantileSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private lazy val events =
    graft.Tables.read(spark, "/root/testdata/sf0.01", "events").persist()

  private def rankError(est: Double, values: Array[Double], q: Double): Double = {
    val below = values.count(_ <= est).toDouble
    math.abs(below / values.length - q)
  }

  test("quantile estimates land within rank error of the exact distribution") {
    val exactValues = events.select(col("value").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val sk = events.select(QuantileSketch.quantileSketch(col("value")).as("sk"))
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = sk.select(QuantileSketch.quantileEstimate(col("sk"), q)).first().getDouble(0)
      val err = rankError(est, exactValues, q)
      assert(err < 0.03, s"q=$q est=$est rank error $err")
    }
  }

  test("per-group sketches union to a sketch with equivalent quantiles") {
    val global = events.select(QuantileSketch.quantileSketch(col("value")).as("sk"))
    val unioned = events.groupBy(col("event_type"))
      .agg(QuantileSketch.quantileSketch(col("value")).as("sk"))
      .select(QuantileSketch.quantileUnion(col("sk")).as("sk"))
    val exactValues = events.select(col("value").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    for (q <- Seq(0.25, 0.5, 0.75)) {
      val est = unioned.select(QuantileSketch.quantileEstimate(col("sk"), q)).first().getDouble(0)
      assert(rankError(est, exactValues, q) < 0.04, s"q=$q union est=$est")
      val g = global.select(QuantileSketch.quantileEstimate(col("sk"), q)).first().getDouble(0)
      assert(rankError(g, exactValues, q) < 0.04, s"q=$q global est=$g")
    }
  }

  test("sketches persist to parquet and answer after reread") {
    val dir = java.nio.file.Files.createTempDirectory("qsk").toString + "/sk"
    events.groupBy(col("event_type"))
      .agg(QuantileSketch.quantileSketch(col("value")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val re = spark.read.parquet(dir)
    val medians = re.select(col("event_type"),
        QuantileSketch.quantileEstimate(col("sk"), 0.5).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (t, p50) =>
      // medians of each group's own distribution — compare loosely
      // by relative position, not equality
      assert(medians.contains(t))
      val spread = math.abs(p50) + 1.0
      assert(math.abs(medians(t) - p50) / spread < 0.5, s"type $t exact=$p50 est=${medians(t)}")
    }
  }

  test("deterministic: identical input yields identical sketch bytes") {
    val a = events.orderBy("event_id").limit(2000)
      .select(QuantileSketch.quantileSketch(col("value")).as("sk"))
      .first().getAs[Array[Byte]](0)
    val b = events.orderBy("event_id").limit(2000)
      .select(QuantileSketch.quantileSketch(col("value")).as("sk"))
      .first().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("plan shows partial/merge object aggregation") {
    val plan = events.groupBy(col("event_type"))
      .agg(QuantileSketch.quantileSketch(col("value")).as("sk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_graft_quantile_sketch"),
      s"plan:\n$plan")
  }
}
