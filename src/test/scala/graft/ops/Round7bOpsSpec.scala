package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the second round-7 operator batch: corpus-calibrated
  * int8 quantization + quantized-domain search, per-group score
  * calibration, hashed bag-of-words features.
  */
class Round7bOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ----------------------------------------------------- Quantization

  private def vecDf(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  test("quantize: calibration endpoints map to -127/+127, constant dim to 0") {
    val df = vecDf(Seq(
      1L -> Seq(0.0, 5.0, 3.0),
      2L -> Seq(10.0, 5.0, 3.0),
      3L -> Seq(5.0, 5.0, 3.0)))
    val cal = Quantization.fitMinMax(df, col("embedding"))
    val got = Quantization.quantize(df, col("vec_id"), col("embedding"), cal)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // dim0: lo=0 hi=10 -> 0 maps to -127, 10 to +127, 5 to round(127)=0
    assert(got(1L) == Seq(-127, 0, 0))
    assert(got(2L) == Seq(127, 0, 0))
    assert(got(3L) == Seq(0, 0, 0)) // midpoint; dim1/dim2 constant -> 0
  }

  test("quantize: codes stay in [-127, 127] and round-trip error is bounded by half a step") {
    val rows = (0L until 50L).map(i => i -> Seq.tabulate(8)(d => math.sin(i * 0.7 + d) * (d + 1)))
    val df = vecDf(rows)
    val cal = Quantization.fitMinMax(df, col("embedding")).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val got = Quantization.quantize(df, col("vec_id"), col("embedding"), cal
        .toSeq.map { case (d, (lo, hi)) => (d, lo, hi) }.toDF("dim", "lo", "hi"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.foreach { case (id, vs) =>
      vs.zipWithIndex.foreach { case (v, d) =>
        val q = got(id)(d)
        assert(q >= -127 && q <= 127)
        val (lo, hi) = cal(d)
        val step = (hi - lo) / 254.0
        val back = lo + (q + 127) * step
        assert(math.abs(back - v.toFloat.toDouble) <= step / 2 + 1e-9,
          s"id=$id dim=$d v=$v back=$back")
      }
    }
  }

  test("quantizedTopK: equals a brute-force integer ranking, deterministic under repartition") {
    val rows = (0L until 120L).map(i => i -> Seq.tabulate(8)(d => math.cos(i * 1.3 + d * 0.5) * 3))
    val df = vecDf(rows)
    val cal = Quantization.fitMinMax(df, col("embedding"))
    val q = Quantization.quantize(df, col("vec_id"), col("embedding"), cal)
    val queries = q.filter(col("vec_id") < 2).select(col("vec_id").as("query_id"), col("qvec"))
    val corpus = q.filter(col("vec_id") >= 2)
    val got = Quantization.quantizedTopK(corpus.repartition(7), queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // reference: driver-side exact integer ranking
    val codes = q.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val expect = (0L until 2L).flatMap { qid =>
      val qv = codes(qid)
      codes.view.filterKeys(_ >= 2).toSeq
        .map { case (id, v) => (id, v.zip(qv).map { case (a, b) => a.toLong * b }.sum) }
        .sortBy { case (id, s) => (-s, id) }
        .take(10).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, (i + 1).toLong) }
    }
    assert(got.sorted.toSeq == expect.sorted)
  }

  // ------------------------------------------------------ Calibration

  test("rankNormalize: matches percent_rank over (group, score, id) exactly") {
    val rows = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 20L), (4L, "en", 40L),
      (5L, "de", 7L), (6L, "de", 9L),
      (7L, "fr", 3L)) // single-row group
    val df = rows.toDF("doc_id", "lang", "score")
    val got = Calibration.rankNormalize(df, col("doc_id"), col("lang"), col("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // en: order 1(10) 2(20) 3(20) 4(40) -> rank0 0..3 over n-1=3
    assert(got(1L) == 0.0 && got(2L) == 1.0 / 3 && got(3L) == 2.0 / 3 && got(4L) == 1.0)
    assert(got(5L) == 0.0 && got(6L) == 1.0)
    assert(got(7L) == 0.0) // single-row group is 0, not NaN
  }

  test("rankNormalize: partitioning-independent and no whole-group window in the plan") {
    val rows = (1L to 500L).map(i => (i, s"g${i % 3}", (i * 37) % 101))
    val df = rows.toDF("doc_id", "lang", "score")
    val a = Calibration.rankNormalize(df, col("doc_id"), col("lang"), col("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1)
    val b = Calibration.rankNormalize(df.repartition(13), col("doc_id"), col("lang"), col("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1)
    assert(a.sameElements(b))
    // every window in the plan partitions by (grp, coarse) or grp over
    // coarse rows — never a whole-group sort of the raw rows: the raw
    // row count per window partition is bounded by the coarse split
    val plan = Calibration.rankNormalize(df, col("doc_id"), col("lang"), col("score"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("coarse"), "expected the coarse-range device in the plan")
  }

  test("rankNormalize: pct >= threshold keeps the top fraction per group") {
    val rows = (1L to 100L).map(i => (i, "en", i)) ++ (101L to 140L).map(i => (i, "de", i))
    val df = rows.toDF("doc_id", "lang", "score")
    val kept = Calibration.rankNormalize(df, col("doc_id"), col("lang"), col("score"))
      .filter(col("pct") >= 0.5)
      .groupBy(col("grp")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ascending scores: top half by rank survives (n/2 rounding to ceil half)
    assert(kept("en") == 50L)
    assert(kept("de") == 20L)
  }

  // --------------------------------------------------------- Features

  test("hashedBow: counts equal a driver-side recount; buckets in range") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "  The  CAT "),
      (3L, "")).toDF("doc_id", "text")
    val got = Features.hashedBow(docs, col("doc_id"), col("text"), dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keys.forall { case (_, b) => b >= 0 && b < 16 })
    // doc1 has 6 tokens ("the" twice) -> total count 6
    assert(got.collect { case ((1L, _), c) => c }.sum == 6L)
    // doc2 normalizes to the same tokens as "the cat" -> same buckets
    val d2 = got.collect { case ((2L, b), c) => b -> c }.toMap
    assert(d2.values.sum == 2L)
    // empty doc emits nothing
    assert(!got.keys.exists(_._1 == 3L))
  }

  test("hashedBow: identical tokens land in identical buckets across docs (pure function)") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta alpha"), (3L, "alpha alpha")).toDF("doc_id", "text")
    val rows = Features.hashedBow(docs, col("doc_id"), col("text"), dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    assert(byDoc(1L) == byDoc(2L)) // order-independent
    assert(byDoc(3L).values.sum == 2L)
    assert(byDoc(3L).size == 1) // same token -> one bucket
  }

  test("hashedBowVec: dense assembly matches the sparse counts with zeros elsewhere") {
    val docs = Seq((1L, "x y x"), (2L, "z")).toDF("doc_id", "text")
    val dim = 8
    val sparse = Features.hashedBow(docs, col("doc_id"), col("text"), dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dense = Features.hashedBowVec(docs, col("doc_id"), col("text"), dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    dense.foreach { case (id, fv) =>
      assert(fv.size == dim)
      fv.zipWithIndex.foreach { case (c, b) =>
        assert(c == sparse.getOrElse((id, b.toLong), 0L))
      }
    }
  }
}
