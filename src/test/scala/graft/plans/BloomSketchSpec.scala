package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BloomSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("no false negatives: every inserted item is found, long and string") {
    val longs = (1L to 2000L).map(_ * 7919L)
    val skL = longs.toDF("x").repartition(8)
      .select(BloomSketch.sketch(col("x"), numBits = 1 << 15).as("s"))
      .first().getAs[Array[Byte]](0)
    val bufL = BloomSketch.deserialize(skL)
    assert(longs.forall { v =>
      val (h1, h2) = BloomSketch.lanesLong(v)
      BloomSketch.mightContain(bufL, h1, h2)
    })
    assert(bufL.n == 2000L)

    val strs = (1 to 500).map(i => s"item-$i")
    val skS = strs.toDF("x").repartition(8)
      .select(BloomSketch.sketch(col("x"), numBits = 1 << 13).as("s"))
      .first().getAs[Array[Byte]](0)
    assert(strs.forall(v => BloomSketch.containsString(
      skS, org.apache.spark.unsafe.types.UTF8String.fromString(v))))
  }

  test("false-positive rate is near the analytic bound at 10 bits/entry") {
    // 3000 entries into 2^15 bits (~10.9 bits/entry), k=5:
    // fill = 1-e^{-kn/m} ~ 0.368, fp ~ fill^5 ~ 0.67%
    val n = 3000
    val sk = (1L to n.toLong).toDF("x")
      .select(BloomSketch.sketch(col("x"), numBits = 1 << 15).as("s"))
      .first().getAs[Array[Byte]](0)
    val buf = BloomSketch.deserialize(sk)
    val fill = BloomSketch.fillRatio(buf)
    assert(fill > 0.25 && fill < 0.5, s"fill $fill out of expected band")
    val probes = (1_000_001L to 1_020_000L)
    val fp = probes.count(v => BloomSketch.containsLong(sk, v)).toDouble / probes.size
    assert(fp < 0.03, s"fp rate $fp too high for the sizing")
  }

  test("merge is byte-exact and idempotent: shard union == one-shot") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.01", "documents")
    val oneShot = docs.select(BloomSketch.sketch(col("source"), 1 << 12).as("s"))
      .first().getAs[Array[Byte]](0)
    val merged = docs.groupBy(col("lang"))
      .agg(BloomSketch.sketch(col("source"), 1 << 12).as("s"))
      .agg(BloomSketch.union(col("s")).as("u"))
      .first().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(oneShot, merged))
    // idempotence (OR): re-merging the same filter changes nothing but n
    val twice = BloomSketch.mergeInto(
      BloomSketch.deserialize(oneShot), BloomSketch.deserialize(oneShot))
    assert(BloomSketch.deserialize(oneShot).words.sameElements(twice.words))
  }

  test("SQL registration: sketch, union, contains") {
    graft.functions.GraftFunctions.register(spark)
    (1L to 100L).toDF("x").createOrReplaceTempView("bloom_in")
    val row = spark.sql(
      """SELECT graft_bloom_contains(s, CAST(7 AS BIGINT)) AS hit,
        |       graft_bloom_contains(s, CAST(1000001 AS BIGINT)) AS miss3
        |FROM (SELECT graft_bloom_sketch(x, 4096, 5) AS s FROM bloom_in)""".stripMargin)
      .first()
    assert(row.getBoolean(0))
    // a single probe can false-positive; with 100 entries in 4096 bits
    // the fp rate is ~1e-5 — treat a hit here as a real failure
    assert(!row.getBoolean(1))
    val u = spark.sql(
      """SELECT graft_bloom_union(s) AS u FROM (
        |  SELECT x % 4 AS g, graft_bloom_sketch(x, 4096, 5) AS s
        |  FROM bloom_in GROUP BY x % 4)""".stripMargin)
      .first().getAs[Array[Byte]](0)
    assert((1L to 100L).forall(v => BloomSketch.containsLong(u, v)))
  }
}
