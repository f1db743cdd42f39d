package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a community assignment over the dup-candidate
  * graph — the quality score that tells you whether the C129
  * label-propagation partition actually found dense dup families or
  * just sliced a hairball (Newman & Girvan 2004): for community c
  * with e_c intra-community edges and degree mass d_c out of m total
  * edges, the contribution is `e_c/m − (d_c/2m)²`, and Q = Σ_c of
  * that. Q near 0 means the partition is no better than random;
  * Q ≥ ~0.3 means real community structure — the go/no-go gate
  * before trusting LPA clusters as dedup retention units.
  *
  * Scale shape: three linear keyed shuffles — a degree count over the
  * edge endpoints, one (node)-keyed join per endpoint to attach
  * labels, and a (label)-keyed partial-agg rollup; the edge total m
  * joins back as a 1-row scalar broadcast. Nothing is quadratic in
  * nodes or communities, and text never enters — the same per-round
  * budget as one LPA iteration, so scoring a partition costs less
  * than producing it.
  */
object Modularity {

  /** Per-community stats: (community, n_nodes, intra_edges,
    * degree_sum, q_contrib). `edges` is an undirected (src, dst)
    * pair list (each pair once); `communities` is (node, community)
    * covering every endpoint (the LabelProp output contract).
    */
  def communityStats(edges: DataFrame, communities: DataFrame): DataFrame = {
    val dr = col("degree_sum").cast("double") / (col("m") * 2)
    rawStats(edges, communities)
      .select(
        col("label").as("community"),
        col("n_nodes"),
        col("intra_edges"),
        col("degree_sum"),
        round(col("intra_edges").cast("double") / col("m") - dr * dr, 6)
          .as("q_contrib"))
      .orderBy(col("community"))
  }

  /** Global Q = Σ_c exact contributions — ONE distributed aggregate
    * over the per-community rollup (never a driver loop over labels:
    * the community count is O(nodes) in the worst case).
    */
  def globalModularity(edges: DataFrame, communities: DataFrame): Double = {
    val dr = col("degree_sum").cast("double") / (col("m") * 2)
    rawStats(edges, communities)
      .agg(sum(col("intra_edges").cast("double") / col("m") - dr * dr).as("q"))
      .collect()(0).getDouble(0)
  }

  /** (label, n_nodes, intra_edges, degree_sum, m) — unrounded. */
  private def rawStats(edges: DataFrame, communities: DataFrame): DataFrame = {
    val e = edges
      .select(col("src").cast("bigint").as("a"), col("dst").cast("bigint").as("b"))
      .sharedPersist()
    val lab = communities
      .select(col("node").cast("bigint").as("node"),
        col("community").cast("bigint").as("label"))
      .sharedPersist()
    val m = e.agg(count(lit(1)).as("m"))
    val deg = e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val dc = lab.join(deg, "node")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("degree_sum"))
    val ec = e
      .join(lab.select(col("node").as("a"), col("label").as("la")), "a")
      .join(lab.select(col("node").as("b"), col("label").as("lb")), "b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("intra_edges"))
    dc.join(ec, Seq("label"), "left")
      .na.fill(0L, Seq("intra_edges"))
      .crossJoin(broadcast(m))
  }
}
