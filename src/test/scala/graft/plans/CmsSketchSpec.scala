package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CmsSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("point estimates never undercount and stay within the eps*n bound") {
    // 1000 rows: "a" x 500, "b" x 300, tail of 200 distinct singletons
    val data = (Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ (1 to 200).map(i => s"t$i"))
      .toDF("x").repartition(8) // force partial/merge
    val sk = data.select(CmsSketch.sketch(col("x")).as("s"))
    val est = sk.select(
        CmsSketch.estimate(col("s"), lit("a")).as("a"),
        CmsSketch.estimate(col("s"), lit("b")).as("b"),
        CmsSketch.estimate(col("s"), lit("t1")).as("t1"),
        CmsSketch.estimate(col("s"), lit("never-seen")).as("zero"))
      .first()
    val bound = math.ceil(1000.0 * math.E / CmsSketch.DefaultWidth).toLong // eps*n
    assert(est.getLong(0) >= 500 && est.getLong(0) <= 500 + bound)
    assert(est.getLong(1) >= 300 && est.getLong(1) <= 300 + bound)
    assert(est.getLong(2) >= 1 && est.getLong(2) <= 1 + bound)
    assert(est.getLong(3) <= bound, "unseen item can only carry collision mass")
  }

  test("merge is byte-exact: union of shard sketches == one-shot sketch") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.01", "documents")
    val oneShot = docs.select(CmsSketch.sketch(col("source")).as("s"))
      .first().getAs[Array[Byte]](0)
    // per-lang shard sketches, then union — different grouping/order
    val merged = docs.groupBy(col("lang"))
      .agg(CmsSketch.sketch(col("source")).as("s"))
      .agg(CmsSketch.union(col("s")).as("u"))
      .first().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(oneShot, merged))
    // and the merged sketch answers exact counts for this small domain
    val exact = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val probe = docs.sparkSession.createDataset(Seq(merged)).toDF("s")
    exact.foreach { case (src, n) =>
      val e = probe.select(CmsSketch.estimate(col("s"), lit(src))).first().getLong(0)
      assert(e >= n, s"$src: $e < $n (CMS must never undercount)")
      assert(e <= n + math.ceil(5000.0 * math.E / CmsSketch.DefaultWidth).toLong, s"$src")
    }
  }

  test("sketch bytes survive a parquet roundtrip") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.01", "documents")
    val sk = docs.groupBy(col("lang")).agg(CmsSketch.sketch(col("source")).as("s"))
    val dir = java.nio.file.Files.createTempDirectory("cms").toString
    sk.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val a = sk.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val b = back.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, bytes) => assert(java.util.Arrays.equals(bytes, b(k)), k) }
  }

  test("sql registration: graft_cms_sketch / graft_cms_union / graft_cms_query") {
    graft.functions.GraftFunctions.register(spark)
    graft.Tables.registerViews(spark, "/root/testdata/sf0.01")
    val got = spark.sql(
      """SELECT graft_cms_query(u, 'src0') AS c FROM (
        |  SELECT graft_cms_union(s) AS u FROM (
        |    SELECT graft_cms_sketch(source) AS s FROM documents GROUP BY lang))""".stripMargin)
      .first().getLong(0)
    assert(got >= 25L, s"src0 count estimate $got") // 25 docs per source at sf0.01
  }
}
