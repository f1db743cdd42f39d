package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the fourth round-7 operator batch: robust per-group
  * outlier gating (median/MAD from the histogram device) and
  * cross-corpus semantic decontamination.
  */
class Round7dOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // -------------------------------------------------------- Outliers

  test("percentileByGroup matches the builtin interpolated percentile") {
    val rows = Seq(
      ("a", 1L), ("a", 7L), ("a", 7L), ("a", 2L), ("a", 9L),
      ("b", 10L), ("b", 20L), ("b", 30L), ("b", 40L),
      ("c", 5L))
    val df = rows.toDF("g", "v")
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val got = Outliers.percentileByGroup(df, col("g"), col("v"), p, "pv")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = df.groupBy(col("g"))
        .agg(expr(s"percentile(v, $p)").as("pv"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == want, s"p=$p")
    }
  }

  test("robustFlags: hand-computed median/MAD, milli-z and gate") {
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L), ("a", 5L, 100L))
      .toDF("g", "id", "v")
    // values 1,2,3,4,100: med=3, devs 2,1,0,1,97, mad=1
    val got = Outliers.robustFlags(df, col("id"), col("g"), col("v"), 2500L)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4),
          Option(r.get(5)).map(_.asInstanceOf[Long]), r.getBoolean(6)))).toMap
    assert(got(1L) == ((1.0, 3.0, 1.0, Some(2000L), false)))
    assert(got(2L) == ((2.0, 3.0, 1.0, Some(1000L), false)))
    assert(got(3L) == ((3.0, 3.0, 1.0, Some(0L), false)))
    assert(got(5L) == ((100.0, 3.0, 1.0, Some(97000L), true)))
  }

  test("robustFlags: a zero-MAD group flags nothing and yields null z") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L), ("a", 4L, 9L))
      .toDF("g", "id", "v")
    // med=5, devs 0,0,0,4 -> mad=0
    val got = Outliers.robustFlags(df, col("id"), col("g"), col("v"), 2500L)
      .collect()
    assert(got.forall(r => r.isNullAt(5)))
    assert(got.forall(!_.getBoolean(6)))
  }

  test("robustFlags: even-sized group interpolates the median") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 4L), ("a", 4L, 8L))
      .toDF("g", "id", "v")
    // sorted 1,2,4,8: med = 3.0; devs 2,1,1,5 -> sorted 1,1,2,5, mad = 1.5
    val got = Outliers.robustFlags(df, col("id"), col("g"), col("v"), 3000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4), r.get(5).asInstanceOf[Long]))).toMap
    assert(got(1L) == ((3.0, 1.5, 1333L)))
    assert(got(4L) == ((3.0, 1.5, 3333L)))
  }

  test("robustFlags is stable under repartitioning") {
    val df = Seq.tabulate(60)(i => ("g" + (i % 3), i.toLong, (i * 37 % 50).toLong))
      .toDF("g", "id", "v")
    val a = Outliers.robustFlags(df, col("id"), col("g"), col("v"), 2000L)
      .orderBy(col("id")).collect().toSeq
    val b = Outliers.robustFlags(df.repartition(7, col("v")),
        col("id"), col("g"), col("v"), 2000L)
      .orderBy(col("id")).collect().toSeq
    assert(a == b)
  }

  // -------------------------------------- Decontaminate.semanticHits

  private val deconAnchors = SemanticDedup.anchors(dim = 4, k = 8, seed = 7L)

  private def cellOfLocal(v: Seq[Double]): Int = {
    val dots = deconAnchors.map(a => a.zip(v).map { case (x, y) => x * y }.sum)
    dots.indexOf(dots.max)
  }

  private def cosLocal(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  test("semanticHits equals the exact same-cell pair scan") {
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(1.0, 0.1, 0.0, 0.0),
      2L -> Seq(0.9, 0.2, 0.05, 0.0),
      3L -> Seq(0.0, 1.0, 0.0, 0.2),
      4L -> Seq(0.0, 0.0, 1.0, 0.0),
      5L -> Seq(1.0, 0.1, 0.0, 0.01),
      6L -> Seq(0.05, 0.95, 0.0, 0.15),
      7L -> Seq(0.02, 0.98, 0.01, 0.18),
      8L -> Seq(-1.0, 0.0, 0.3, 0.0))
    val df = vecs.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val isEval = (id: Long) => id % 3 == 0
    val eval = df.filter(pmod(col("vec_id"), lit(3L)) === 0)
    val train = df.filter(pmod(col("vec_id"), lit(3L)) =!= 0)
    val thr = 0.8
    val got = Decontaminate.semanticHits(train, col("vec_id"), col("embedding"),
        eval, col("vec_id"), col("embedding"), thr, deconAnchors)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val want = vecs.filterNot(v => isEval(v._1)).flatMap { case (tid, tv) =>
      val hits = vecs.filter(v => isEval(v._1))
        .filter { case (_, ev) => cellOfLocal(ev) == cellOfLocal(tv) }
        .map { case (_, ev) => cosLocal(tv, ev) }
        .filter(_ >= thr)
      if (hits.isEmpty) None
      else Some(tid -> ((hits.size.toLong,
        BigDecimal(hits.max).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    }.toMap
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce at least one hit")
  }

  test("an identical vector in train and eval is flagged at cosine 1") {
    val df = Seq(
      (1L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),
      (3L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val eval = df.filter(col("vec_id") === 3L)
    val train = df.filter(col("vec_id") =!= 3L)
    val got = Decontaminate.semanticHits(train, col("vec_id"), col("embedding"),
        eval, col("vec_id"), col("embedding"), 0.99, deconAnchors)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 1L, 1.0)))
  }

  test("semanticClean drops exactly the flagged rows") {
    val df = Seq(
      (1L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.1f, 0.0f, 1.0f)),
      (3L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),
      (4L, Seq(-0.7f, 0.0f, 0.7f, 0.0f)))
      .toDF("vec_id", "embedding")
    val eval = df.filter(col("vec_id") === 3L)
    val train = df.filter(col("vec_id") =!= 3L)
    val clean = Decontaminate.semanticClean(train, col("vec_id"), col("embedding"),
        eval, col("vec_id"), col("embedding"), 0.99, deconAnchors)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    assert(clean.toSeq == Seq(2L, 4L))
  }
}
