package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the sixth round-8 operator batch: PSI drift monitor,
  * ARI clustering agreement.
  */
class Round8fOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------------- PSI

  test("psi: hand-computed two-bin shift") {
    val ref = Seq(1L, 1L, 2L).toDF("bin")
    val cur = Seq(1L, 2L, 2L).toDF("bin")
    val got = CorpusStats.psi(ref, cur).orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Laplace: p1=3/5, q1=2/5 -> .2*ln(1.5) = 81093 micro; bin 2 mirrors
    assert(got.toSeq == Seq((1L, 2L, 1L, 81093L), (2L, 1L, 2L, 81093L)))
  }

  test("psi: identical distributions are ~zero; missing bins survive") {
    val same = Seq(1L, 2L, 3L, 3L).toDF("bin")
    val z = CorpusStats.psi(same, same).collect()
    assert(z.forall(_.getLong(3) == 0L))
    val got = CorpusStats.psi(Seq(1L).toDF("bin"), Seq(2L).toDF("bin"))
      .orderBy("bin").collect()
    // disjoint singletons: each bin contributes (2/3 - 1/3)·ln 2
    assert(got.map(_.getLong(3)).toSeq == Seq(231049L, 231049L))
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L), (0L, 1L)))
  }

  test("psi is symmetric in total") {
    val a = (1L to 100L).map(_ % 7).toDF("bin")
    val b = (1L to 100L).map(i => (i * 3) % 5).toDF("bin")
    val ab = CorpusStats.psi(a, b).agg(org.apache.spark.sql.functions.sum("psi_micro"))
      .collect()(0).getLong(0)
    val ba = CorpusStats.psi(b, a).agg(org.apache.spark.sql.functions.sum("psi_micro"))
      .collect()(0).getLong(0)
    assert(math.abs(ab - ba) <= got_eps && ab > 0)
  }
  private val got_eps = 9L // per-bin floor quantization, <= 1 micro x bins

  // ------------------------------------------------------------- ARI

  private def ari(pa: Seq[(Long, String)], pb: Seq[(Long, String)]): Long =
    ClusterAgreement.ariMilli(pa.toDF("id", "cell"), pb.toDF("id", "cell"))
      .collect()(0).getLong(6)

  test("ari: identical partitions score 1000") {
    val p = Seq(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b")
    assert(ari(p, p) == 1000L)
  }

  test("ari: hand-computed partial agreement = 324 milli") {
    val pa = Seq(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "b", 5L -> "b", 6L -> "b")
    val pb = Seq(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b", 5L -> "b", 6L -> "b")
    // 2(15*4 - 42) / (15*13 - 84) = 36/111 -> floor-milli 324
    assert(ari(pa, pb) == 324L)
  }

  test("ari: crossing partitions score negative, trunc toward zero") {
    val pa = Seq(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b")
    val pb = Seq(1L -> "x", 2L -> "y", 3L -> "x", 4L -> "y")
    assert(ari(pa, pb) == -500L)
  }

  test("ari: degenerate all-singleton partitions report the 1000 convention") {
    val pa = Seq(1L -> "p", 2L -> "q", 3L -> "r")
    val pb = Seq(1L -> "x", 2L -> "y", 3L -> "z")
    assert(ari(pa, pb) == 1000L)
  }

  test("ari full row: counts and pair sums") {
    val pa = Seq(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "b", 5L -> "b", 6L -> "b")
    val pb = Seq(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b", 5L -> "b", 6L -> "b")
    val r = ClusterAgreement.ariMilli(pa.toDF("id", "cell"), pb.toDF("id", "cell"))
      .collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 4L && r.getLong(4) == 6L && r.getLong(5) == 7L)
  }
}
