package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the third round-8 operator batch: k-core decomposition,
  * chi-square feature selection, ROC curve points, grid-blocked
  * spatial radius join, Benford leading-digit audit.
  */
class Round8cOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ----------------------------------------------------------- KCore

  private def coreSet(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    KCore.core(edges.toDF("src", "dst"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-core of a triangle with a tail peels the tail") {
    val got = coreSet(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L)), 2)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k-core is empty when no subgraph is dense enough") {
    assert(coreSet(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 2).isEmpty)
  }

  test("k-core of a clique is the clique at k = size - 1") {
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val got = coreSet(clique, 4)
    assert(got.keySet == (1L to 5L).toSet && got.values.forall(_ == 4L))
  }

  test("peeling cascades: removing the tail can strand its anchor") {
    // 3-4-5 chain hangs off triangle 1-2-3: 5 goes (deg 1), then 4,
    // leaving the pure triangle as the 2-core fixpoint
    val got = coreSet(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 5L)), 2)
    assert(got.keySet == Set(1L, 2L, 3L))
  }

  test("profile reports the erosion curve") {
    val clique = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)) ++
      Seq((4L, 5L), (5L, 6L))
    val prof = KCore.profile(clique.toDF("src", "dst"), 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof(1) == ((6L, 8L)))  // everything
    assert(prof(2) == ((4L, 6L)))  // chain gone
    assert(prof(3) == ((4L, 6L)))  // clique survives
    assert(prof(4) == ((0L, 0L)))  // nothing is 4-dense
  }

  // --------------------------------------------------- FeatureSelect

  private val chiDocs = Seq(
    (1L, "a b", "en"), (2L, "a", "en"), (3L, "b", "de"), (4L, "b", "de"))

  test("chiSquare: exact integer milli-chi2 on a hand-computed table") {
    val got = FeatureSelect.chiSquare(chiDocs.toDF("doc_id", "text", "lang"),
        col("doc_id"), col("text"), col("lang"), minDf = 1, topN = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    // token a: df=2, D_en=4, D_de=-4; chi2 = 16/8 + 16/8 = 4.0
    assert(got("a") == ((2L, 4000L, "en", 1L)))
    // token b: df=3, D_en=-2, D_de=2; per-class floor(4000/6)=666
    assert(got("b") == ((3L, 1332L, "de", 2L)))
  }

  test("chiSquare drops all-doc tokens and respects minDf") {
    val docs = Seq((1L, "x common", "en"), (2L, "x common", "en"),
      (3L, "x other", "de"), (4L, "x other", "de"))
    val got = FeatureSelect.chiSquare(docs.toDF("doc_id", "text", "lang"),
        col("doc_id"), col("text"), col("lang"), minDf = 2, topN = 10)
      .collect().map(_.getString(0)).toSet
    assert(!got.contains("x"))           // df = n: no signal, div guard
    assert(got == Set("common", "other"))
  }

  test("chiSquare ranks the discriminative token first") {
    val docs = (1L to 20L).map { i =>
      val lang = if (i <= 10) "en" else "de"
      val txt = if (i <= 10) s"the signal token$i" else s"the noise token$i"
      (i, txt, lang)
    }
    val top = FeatureSelect.chiSquare(docs.toDF("doc_id", "text", "lang"),
        col("doc_id"), col("text"), col("lang"), minDf = 3, topN = 5)
      .collect()
    assert(Set("signal", "noise").contains(top.head.getString(0)))
    assert(top.head.getLong(2) == 20000L) // perfect split: chi2 = n
    // 'the' appears everywhere -> excluded by the df < n guard
    assert(!top.map(_.getString(0)).contains("the"))
  }

  // -------------------------------------------------------- RocCurve

  test("rocPoints: hand-computed sweep") {
    val df = Seq((3L, true), (3L, false), (2L, true), (1L, false), (1L, false))
      .toDF("score", "y")
    val got = RocCurve.points(df, col("score"), col("y"))
      .orderBy(col("threshold").desc)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got(0) == ((3L, 1L, 1L, 0.5, 0.3333, 0.5)))
    assert(got(1) == ((2L, 2L, 1L, 1.0, 0.3333, 0.6667)))
    assert(got(2) == ((1L, 2L, 3L, 1.0, 1.0, 0.4)))
  }

  test("rocPoints ends at (1, 1) and is monotone") {
    val df = (1L to 100L).map(i => (i % 17, i % 3 == 0)).toDF("score", "y")
    val rows = RocCurve.points(df, col("score"), col("y"))
      .orderBy(col("threshold").desc).collect()
    val tprs = rows.map(_.getDouble(5))
    val fprs = rows.map(_.getDouble(6))
    assert(tprs.last == 1.0 && fprs.last == 1.0)
    assert(tprs.zip(tprs.tail).forall { case (a, b) => a <= b })
    assert(fprs.zip(fprs.tail).forall { case (a, b) => a <= b })
  }

  // ------------------------------------------------------ SpatialJoin

  test("radiusSelfJoin: hand case incl. the exact-radius boundary") {
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 10L, 10L)).toDF("id", "x", "y")
    val got = SpatialJoin.radiusSelfJoin(pts, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 25L, 5.0)))
  }

  test("radiusSelfJoin equals brute force on a deterministic field") {
    val n = 200
    val pts = (1 to n).map { i =>
      (i.toLong, (i * 7919L) % 1000L, (i * 104729L) % 1000L)
    }
    val want = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 50L * 50L
    } yield (ia, ib, d2)).toSet
    val got = SpatialJoin.radiusSelfJoin(pts.toDF("id", "x", "y"), 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("radiusSelfJoin produces each qualifying pair exactly once") {
    // every point in one tight cluster: all pairs qualify, none doubled
    val pts = (1L to 10L).map(i => (i, 100L + i, 100L)).toDF("id", "x", "y")
    val rows = SpatialJoin.radiusSelfJoin(pts, 20L).collect()
    assert(rows.length == 45)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == 45)
  }

  // ---------------------------------------------------------- Benford

  test("benfordAudit: one of each digit, zeros and negatives ignored") {
    val df = (Seq(0L, -5L) ++ (1L to 9L)).toDF("u")
    val got = Profiler.benfordAudit(df, col("u"))
      .orderBy(col("digit"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 9)
    got.zipWithIndex.foreach { case ((d, n, obs, exp), i) =>
      assert(d == i + 1 && n == 1L && obs == 111111L)
      assert(exp == Profiler.BenfordMicro(i))
    }
  }

  test("benfordAudit emits all 9 digits even when some are absent") {
    val got = Profiler.benfordAudit(Seq(1L, 19L, 123L).toDF("u"), col("u"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == (1 to 9).map(d => d -> (if (d == 1) 3L else 0L)).toMap)
  }

  test("benfordAudit on multiplicative data tracks Benford closely") {
    // powers of 3 are classically Benford-ish (38 fit in a long)
    val vals = (1 to 38).map(i => math.pow(3, i).toLong)
    val dev = Profiler.benfordAudit(vals.toDF("u"), col("u"))
      .agg(max(col("dev_micro"))).collect()(0).getLong(0)
    assert(dev < 50000L) // measured 26082 micro vs the Benford table
  }
}
