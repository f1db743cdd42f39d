package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Randomized full-int64-domain checks for the shared prefix-sum
  * device: the partitioned two-pass path must equal the single-window
  * path (and an in-memory reference) for ANY value set — including
  * domains spanning more than 2^63 (Long.MinValue..Long.MaxValue),
  * where the naive `(v - lo) / step` coarse key would wrap and break
  * monotonicity. This property-tests the halved-value overflow
  * argument the EquiDepth scaladoc makes.
  */
class PrefixDevicePropertySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private val extremeValues = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MinValue + 1000L),
    Gen.choose(-1000L, 1000L),
    Gen.choose(Long.MaxValue - 1000L, Long.MaxValue),
    Gen.choose(Long.MinValue, Long.MaxValue))

  test("cumPartitionedMulti == cumSingleMulti == in-memory reference over the FULL long domain") {
    for (seed <- 1L to 6L; asc <- Seq(true, false)) {
      val vs = sample(Gen.listOfN(60, extremeValues.flatMap(identity(_))), seed)
        .distinct
      val rows = vs.map(v => (v, math.abs(v % 13) + 1, math.abs(v % 7)))
      val counts = rows.toDF("v", "p", "n")

      val single = EquiDepth.cumSingleMulti(counts, Seq("p", "n"), asc)
        .select("v", "cum_before_p", "cum_before_n")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val part = EquiDepth.cumPartitionedMulti(counts, Seq("p", "n"), asc)
        .select("v", "cum_before_p", "cum_before_n")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

      // in-memory reference: exclusive prefix over the sorted order
      val ordered = { val s = rows.sortBy(_._1); if (asc) s else s.reverse }
      var (cp, cn) = (0L, 0L)
      val expect = ordered.map { case (v, p, n) =>
        val e = v -> (cp, cn); cp += p; cn += n; e
      }.toMap

      assert(single == expect, s"single vs reference, seed=$seed asc=$asc")
      assert(part == expect, s"partitioned vs reference, seed=$seed asc=$asc")
    }
  }

  test("a domain spanning more than 2^63 keeps the coarse key monotone (no wrap)") {
    // lo near MinValue, hi near MaxValue: (hi - lo) wraps negative in
    // raw long arithmetic — the halved-value key must still order
    val vs = Seq(Long.MinValue, Long.MinValue / 2, -1L, 0L, 1L,
      Long.MaxValue / 2, Long.MaxValue)
    val counts = vs.map(v => (v, 1L)).toDF("v", "c")
    val got = EquiDepth.cumPartitionedMulti(counts, Seq("c"), asc = true)
      .select("v", "cum_before_c")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = vs.sorted.zipWithIndex.map { case (v, i) => v -> i.toLong }.toMap
    assert(got == expect)
  }
}
