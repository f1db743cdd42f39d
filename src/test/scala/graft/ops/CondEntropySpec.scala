package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C135: conditional bigram entropy — rigid-order boilerplate scores
  * ~0 conditional entropy while shuffled-order text with the SAME
  * unigram distribution scores high; hand-computed micro-nats.
  */
class CondEntropySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("deterministic order -> zero conditional entropy; shuffled -> positive") {
    val df = Seq(
      // rigid: every bigram is fully determined by its first token
      ("rigid", "a b c a b c a b c a b c"),
      // same tokens, scrambled order: many successors per token
      ("loose", "a b c c a b b c a c b a")
    ).toDF("source", "text")
    val got = NgramStats.conditionalEntropy(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

    val (nt, nb, hUni, hBi, hCond) = got("rigid")
    assert(nt === 12L && nb === 11L)
    // unigram: p = 1/3 each -> H = ln 3 = 1.098612 -> floored micro sum
    assert(math.abs(hUni - 1098612L) <= 3L)
    // bigrams of the rigid stream: ab(4), bc(4), ca(3) out of 11 —
    // H = -(4/11 ln 4/11)*2 - 3/11 ln 3/11 ~ 1.0888; H(w2|w1) ~ 0
    assert(hCond < 20000L) // < 0.02 nats: order is deterministic
    val (_, _, hUniL, _, hCondL) = got("loose")
    assert(math.abs(hUniL - 1098612L) <= 3L) // same unigram dist
    assert(hCondL > 500000L) // > 0.5 nats of genuine successor choice
  }

  test("single-token docs fall back to the whole-text gram convention") {
    val df = Seq(("s", "solo")).toDF("source", "text")
    val r = NgramStats.conditionalEntropy(df, col("source"), col("text"))
      .collect()(0)
    assert(r.getLong(1) === 1L && r.getLong(2) === 1L)
    assert(r.getLong(3) === 0L && r.getLong(4) === 0L && r.getLong(5) === 0L)
  }
}
