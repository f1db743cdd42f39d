package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank over a link graph — the link-centrality signal web-corpus
  * pipelines use for document quality priors (a page's rank in the
  * host/link graph gates its crawl priority and its sampling weight;
  * harmonic/PageRank centrality is the canonical CommonCrawl-style
  * ranking).
  *
  * All arithmetic is INTEGER: ranks carry a 1e9 fixed-point unit,
  * per-edge contributions are integer-divided by out-degree, damping
  * is `(850 * inflow) DIV 1000`. Integer sums are associative and
  * integer division is engine-portable, so a fixed iteration count
  * is bit-exact across engines and partitionings — the DuckDB twin
  * unrolls the same iterations as CTEs and hash-matches.
  *
  * Scale shape: per iteration, one join of the rank vector to the
  * edge list on src (both keyed by node id — co-partitionable, and
  * the rank vector is ALWAYS the small side: broadcast when it fits,
  * shuffle-hash otherwise under AQE) and one partial-aggregated
  * shuffle summing contributions by dst. Degrees are computed once.
  * No driver-side state — the rank vector never leaves the cluster;
  * iteration count is fixed (the convergence-check variant would add
  * one scalar agg per iteration).
  */
object PageRank {

  /** 1e9 — the fixed-point unit of one node's initial rank. Sized
    * so `DampMilli * inflow` stays inside int64 even when a single
    * hub node receives most of the graph's mass at ~1e6-node scale
    * (total mass N·Unit; 1e6 · 1e9 · 850 ≈ 8.5e17 < 2^63). Larger
    * graphs: shrink Unit — the oracle twin scales with it. */
  final val Unit = 1000000000L

  /** Damping in milli-units (850 = the classic 0.85). */
  final val DampMilli = 850L

  /** Fixed-iteration integer PageRank. `edges` must have columns
    * (src, dst); parallel edges are collapsed first (an explicit
    * `distinct`, so out-degrees count distinct neighbors). Returns
    * (node, rank_scaled, rank) where rank_scaled is the exact
    * fixed-point integer and rank = rank_scaled / Unit rounded 6dp.
    * Dangling-node mass is dropped (the standard simplified
    * formulation) — identically in the twin.
    */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, "unrolled oracle twin supports 1..8 iterations")
    val e = edges.select(col("src").cast("bigint").as("src"),
        col("dst").cast("bigint").as("dst"))
      .distinct()
      .sharedPersist()

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .sharedPersist()

    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val teleport = Unit - DampMilli * Unit / 1000L // (1 - d) * Unit, exact

    var rank = nodes.select(col("node"), lit(Unit).as("rank_scaled"))
    for (_ <- 1 to iters) {
      val inflow = e
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          expr("rank_scaled DIV outdeg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("inflow"))
      rank = nodes
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($DampMilli * coalesce(inflow, 0)) DIV 1000")).as("rank_scaled"))
    }
    rank.select(col("node"), col("rank_scaled"),
      round(col("rank_scaled").cast("double") / Unit, 6).as("rank"))
  }

  /** DuckDB twin of [[ranks]]: the same iterations unrolled as CTEs
    * over `edgeSql` (a relation with columns src, dst). Final
    * relation is `prank`.
    */
  /** @param shards hash-range sharding of the twin's two unbounded
    *        hash states — the edge DISTINCT (keyed on (src, dst)) and
    *        each iteration's inflow aggregate (keyed on dst) — as a
    *        union of `hash % shards` sub-queries over MATERIALIZED
    *        inputs (the C82/ParagraphDedup device): every sharded
    *        operation is key-local, so the union is bit-identical and
    *        peak memory drops to one shard's hash table. That is what
    *        lets the 160 M-edge sf10 closure run inside a single-node
    *        DuckDB memory cap instead of exhausting the spill disk
    *        (the pre-r13 oracle-capacity exemption). Every CTE a
    *        union branch references is MATERIALIZED — a plain CTE
    *        would re-inline the whole preceding iteration chain once
    *        per branch (shards^iters blowup). shards=1 degenerates to
    *        the unsharded plan.
    */
  def ranksSql(edgeSql: String, iters: Int, shards: Int = 1): String = {
    require(iters >= 1 && iters <= 8)
    require(shards >= 1, "shards must be >= 1")
    val teleport = Unit - DampMilli * Unit / 1000L
    def shardPred(key: String, s: Int): String =
      if (shards == 1) "TRUE" else s"hash($key) % $shards = $s"
    // variadic hash(src, dst): an arithmetic key combiner (src*K+dst)
    // overflows INT64 at sf10 key ranges, and DuckDB RAISES on int64
    // overflow where Spark wraps
    val distinctUnion = (0 until shards).map { s =>
      s"""SELECT DISTINCT src, dst FROM pr_base
         |  WHERE ${shardPred("src, dst", s)}""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    val base =
      s"""pr_base AS MATERIALIZED (
         |  SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
         |  FROM ($edgeSql)),
         |pr_e AS MATERIALIZED (
         |  $distinctUnion),
         |pr_nodes AS MATERIALIZED (SELECT src AS node FROM pr_e UNION SELECT dst FROM pr_e),
         |pr_deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM pr_e GROUP BY src),
         |pr_r0 AS MATERIALIZED (SELECT node, CAST($Unit AS BIGINT) AS rank_scaled FROM pr_nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      val inflowUnion = (0 until shards).map { s =>
        s"""SELECT e.dst AS node, sum(r.rank_scaled // d.outdeg) AS inflow
           |  FROM pr_e e JOIN pr_r${i - 1} r ON e.src = r.node JOIN pr_deg d ON e.src = d.src
           |  WHERE ${shardPred("e.dst", s)}
           |  GROUP BY e.dst""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""pr_in$i AS (
         |  $inflowUnion),
         |pr_r$i AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST($teleport + ($DampMilli * coalesce(f.inflow, 0)) // 1000 AS BIGINT) AS rank_scaled
         |  FROM pr_nodes n LEFT JOIN pr_in$i f USING (node))""".stripMargin
    }
    val fin =
      s"""prank AS (
         |  SELECT node, rank_scaled,
         |    round(CAST(rank_scaled AS DOUBLE) / $Unit, 6) AS rank
         |  FROM pr_r$iters)""".stripMargin
    (base +: steps :+ fin).mkString(",\n")
  }
}
