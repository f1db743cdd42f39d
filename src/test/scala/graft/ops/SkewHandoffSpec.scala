package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The diagnosis→mitigation HANDOFF (C76 → C13), end to end: a
  * zipf-skewed join key is measured by Diagnostics.keySkew, the
  * measurement names the hot key, and Salting's rewrite provably (a)
  * returns the identical join result and (b) balances the shuffle the
  * unsalted plan funnels through one partition. This is the loop a
  * 100 TB operator runs: measure, decide, rewrite.
  */
class SkewHandoffSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val Buckets = 8

  // zipf-ish: "hot" holds half of all rows; 40 cold keys share the rest
  private lazy val large = (
    (1 to 4000).map(i => (i.toLong, "hot")) ++
    (1 to 4000).map(i => (4000L + i, s"k${i % 40}"))
  ).toDF("id", "k").cache()

  private lazy val small = ("hot" +: (0 until 40).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "dim").cache()

  test("keySkew flags the hot key with its row share") {
    val top = Diagnostics.keySkew(large, col("k"), topN = 1).collect().head
    assert(top.getAs[String]("key") == "hot")
    assert(top.getAs[Long]("n") == 4000L)
    // hot holds 50% of rows -> top_share_milli == 500
    assert(top.getAs[Long]("top_share_milli") == 500L)
  }

  private def partitionSizes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.groupBy(spark_partition_id()).count().collect().map(_.getLong(1)).toSeq

  test("unsalted shuffle funnels the hot key through one partition; the salted key balances it") {
    val unsalted = partitionSizes(large.repartition(Buckets, col("k")))
    // the hot key's 4000 rows land in ONE partition: max >= 50%
    assert(unsalted.max >= 4000L,
      s"expected a straggler partition >= 4000 rows, got $unsalted")

    val salted = partitionSizes(large.repartition(Buckets,
      col("k"), Salting.saltFrom(Buckets, col("id"))))
    // the hot key fans out over every salt value...
    val hotSalts = large.filter(col("k") === "hot")
      .select(Salting.saltFrom(Buckets, col("id")).as("s"))
      .distinct().count()
    assert(hotSalts == Buckets.toLong,
      s"hot key should spread over all $Buckets salts, got $hotSalts")
    // ...so the straggler partition shrinks to at most half the
    // unsalted funnel (cold keys still stack stochastically on top of
    // the ~1000-row uniform share, so the bound is structural, not
    // perfectly uniform)
    assert(salted.max <= unsalted.max / 2,
      s"expected the straggler halved (<= ${unsalted.max / 2}), got $salted")
  }

  test("saltedJoin returns exactly the unsalted join's rows") {
    val plain = large.join(small, "k")
    val mitigated = Salting.saltedJoin(large, small, "k", Buckets, col("id"))
    assert(mitigated.count() == plain.count())
    assert(mitigated.except(plain).isEmpty && plain.except(mitigated).isEmpty)
  }
}
