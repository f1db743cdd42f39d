package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C140 Newman modularity: hand-checked contributions on known
  * graphs, zero-intra communities, and the global sum.
  */
class ModularitySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // two triangles {1,2,3} and {4,5,6} joined by one bridge 3-4
  private def twoTriangles =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("src", "dst")

  private def triangleCommunities =
    Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L), (6L, 20L))
      .toDF("node", "community")

  test("two-triangle bridge graph: exact per-community stats and contributions") {
    val rows = Modularity.communityStats(twoTriangles, triangleCommunities).collect()
    assert(rows.length == 2)
    // m=7; each side: 3 intra edges, degree mass 2+2+3=7
    // q = 3/7 - (7/14)^2 = 0.428571... - 0.25 = 0.178571
    for (r <- rows) {
      assert(r.getAs[Long]("n_nodes") == 3L)
      assert(r.getAs[Long]("intra_edges") == 3L)
      assert(r.getAs[Long]("degree_sum") == 7L)
      assert(math.abs(r.getAs[Double]("q_contrib") - 0.178571) < 1e-9)
    }
    val q = Modularity.globalModularity(twoTriangles, triangleCommunities)
    assert(math.abs(q - (2.0 * (3.0 / 7 - 0.25))) < 1e-12)
  }

  test("a community with zero intra edges gets a negative contribution, not a null") {
    // single edge 1-2 split across two communities: q_c = 0 - (1/2)^2
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val comm = Seq((1L, 1L), (2L, 2L)).toDF("node", "community")
    val rows = Modularity.communityStats(edges, comm).collect()
    assert(rows.length == 2)
    for (r <- rows) {
      assert(r.getAs[Long]("intra_edges") == 0L)
      assert(r.getAs[Double]("q_contrib") == -0.25)
    }
    assert(math.abs(Modularity.globalModularity(edges, comm) + 0.5) < 1e-12)
  }

  test("one community holding the whole graph scores Q = 0") {
    // Q = m/m - (2m/2m)^2 = 0 when everything is one community
    val comm = (1L to 6L).map(n => (n, 99L)).toDF("node", "community")
    val rows = Modularity.communityStats(twoTriangles, comm).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("intra_edges") == 7L)
    assert(rows(0).getAs[Long]("degree_sum") == 14L)
    assert(rows(0).getAs[Double]("q_contrib") == 0.0)
    assert(math.abs(Modularity.globalModularity(twoTriangles, comm)) < 1e-12)
  }

  test("the good partition beats the random-ish one on the bridge graph") {
    // split one triangle across communities: Q drops
    val bad = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L), (5L, 20L), (6L, 20L))
      .toDF("node", "community")
    val good = Modularity.globalModularity(twoTriangles, triangleCommunities)
    val worse = Modularity.globalModularity(twoTriangles, bad)
    assert(good > worse)
  }
}
