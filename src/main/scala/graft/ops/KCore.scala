package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core decomposition of the near-dup candidate graph — the
  * density filter that separates REAL duplicate communities from the
  * sparse hair a candidate generator (C2-C5, C67) inevitably emits:
  * a node in the 3-core has three candidate partners that are also
  * mutually entangled, which near-random shingle collisions cannot
  * produce, so "k-core members" is a high-precision dup-community
  * seed while chains and stars (the transitive-merge hazards) peel
  * away. Complements C105's triangle diagnostic (local density)
  * with the global fixpoint structure.
  *
  * The k-core is the UNIQUE maximal subgraph with min degree >= k —
  * peeling order cannot change the result, so the operator is
  * deterministic without any ordering device and the DuckDB twin
  * (a recursive CTE running the same peel) hash-matches.
  *
  * Scale shape: classic distributed peeling. Per round, one
  * partial-aggregated degree count over the surviving edge list and
  * two semi-joins keyed on the 8-byte node id — fixed-width rows
  * only, no text. Rounds = peel depth of the graph (small for the
  * bounded-df anchor graphs this consumes; worst case the longest
  * chain/2). Lineage is truncated with a periodic localCheckpoint so
  * the plan does not grow with the iteration count; per round the
  * loop runs one full degree job and one cached anti-join job, and
  * the converged round's cached degree table doubles as the output.
  */
object KCore {

  /** Nodes of the k-core with their within-core degree.
    *
    * @param edges (src, dst) undirected; canonicalized + distinct here
    * @return (node, core_degree) for every k-core member
    */
  def core(edges: DataFrame, k: Int, maxRounds: Int = 200): DataFrame = {
    require(k >= 1, "k >= 1")
    // The peel loop keeps the distinct's own shuffle partitioning:
    // a fixed coalesce here would either be a no-op (target >= the
    // shuffle-partition count, the local case) or funnel every
    // degree count and anti-join round of a LARGE candidate graph
    // through that many tasks at cluster scale — coalesce only ever
    // reduces partition count. Peel rounds are launch-bound at test
    // scale either way; at data scale the partitioning must track
    // the input.
    var e = edges.select(
        least(col("src").cast("bigint"), col("dst").cast("bigint")).as("a"),
        greatest(col("src").cast("bigint"), col("dst").cast("bigint")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint()
    // Per round: ONE degree job (count() — never isEmpty/take(1),
    // which populates the cache only partially and forces the
    // anti-join to re-run the degree shuffle) + one cheap cached
    // anti-join job. The converged round's degree table IS the
    // result — no extra output pass.
    var rounds = 0
    var result: DataFrame = null
    while (result == null) {
      require(rounds <= maxRounds,
        s"k-core peel did not converge within $maxRounds rounds")
      val deg = degrees(e).persist(StorageLevel.MEMORY_AND_DISK)
      val drop = deg.filter(col("degree") < k).select(col("node"))
      if (drop.count() == 0L) {
        result = deg.select(col("node"), col("degree").as("core_degree"))
      } else {
        val ne = e
          .join(drop.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
          .join(drop.withColumnRenamed("node", "b"), Seq("b"), "left_anti")
          .select(col("a"), col("b"))
        // lineage stays bounded: a real checkpoint copy every 8th
        // round, a plain persist otherwise
        val mat = if ((rounds + 1) % 8 == 0) ne.localCheckpoint()
          else ne.persist(StorageLevel.MEMORY_AND_DISK)
        mat.count()
        deg.unpersist()
        e = mat
        rounds += 1
      }
    }
    result
  }

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))

  /** Peel-layer summary: for each k in [1, kMax], the k-core's node
    * and edge count — the density profile of the candidate graph
    * (how fast it erodes under peeling distinguishes clique-heavy
    * from chain-heavy corpora at a glance).
    */
  def profile(edges: DataFrame, kMax: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    (1 to kMax).map { k =>
      val c = core(edges, k).agg(
          count(lit(1)).as("n_nodes"),
          (coalesce(sum(col("core_degree")), lit(0L)) / 2).cast("bigint").as("n_edges"))
        .collect()(0)
      (k, c.getLong(0), c.getLong(1))
    }.toDF("k", "n_nodes", "n_edges")
  }
}
