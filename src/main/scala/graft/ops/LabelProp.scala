package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection over the dup-
  * candidate graph: every node starts as its own community; each
  * round it adopts the most frequent label among its neighbours
  * (ties to the smallest label). Communities are denser than
  * connected components (C21) — a bridge edge joins two CCs into one
  * component but LPA keeps the two dense sides apart — which is what
  * you want when one spurious candidate pair would otherwise glue two
  * unrelated dup families into a mega-cluster.
  *
  * Deterministic by construction: updates are synchronous (round r
  * reads only round r−1 labels), the vote is an exact integer count,
  * and ties break on the smallest label — no traversal-order or
  * partitioning dependence, so a fixed iteration count is bit-exact
  * across engines (the same unrolled-CTE oracle device as C44
  * PageRank / C7b IVF).
  *
  * Scale shape: per round ONE (node, label)-keyed partial-agg count
  * and one per-node argmax fold (max of a (cnt, −label) struct —
  * partial-agg, never a window); labels are 8-byte pairs, text never
  * enters. Rounds are a fixed small constant.
  */
object LabelProp {

  /** (node, community) after `iters` synchronous rounds. `edges` is
    * an undirected pair list (src, dst), each pair once.
    */
  def communities(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be positive")
    // persist the DIRECTED edge list first: the union references it
    // twice, and without the cache the whole upstream candidate-edge
    // pipeline evaluates twice just to flip (u, v)
    val und = edges
      .select(col("src").cast("bigint").as("u"), col("dst").cast("bigint").as("v"))
      .sharedPersist()
    // pre-partition the static side by the JOIN key and cache THAT:
    // the cached hash partitioning satisfies every round's join
    // requirement, so rounds shuffle only the (node, label) pairs and
    // the post-join vote — not the edge list again each round
    val both = und
      .union(und.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("v"))
      .sharedPersist()
    var labels = both.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      labels = both.alias("e")
        .join(labels.alias("l"), col("e.v") === col("l.node"))
        .groupBy(col("e.u").as("u"), col("l.label").as("nl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("u"))
        .agg(max(struct(col("cnt"), (-col("nl")).as("neg"))).as("m"))
        .select(col("u").as("node"), (-col("m.neg")).as("label"))
    }
    labels.select(col("node"), col("label").as("community"))
  }

  /** Unrolled DuckDB CTE chain: expects an `ed(a, b)` relation of
    * undirected pairs (a < b) in scope; final relation
    * `lp$iters(node, label)`.
    */
  def communitiesCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """lpe AS (SELECT a AS u, b AS v FROM ed UNION ALL SELECT b, a FROM ed),
        |lp0 AS (SELECT DISTINCT u AS node, u AS label FROM lpe),
        |""".stripMargin)
    for (r <- 1 to iters) {
      sb.append(
        s"""lpv$r AS (SELECT e.u, l.label, count(*) AS cnt
           |        FROM lpe e JOIN lp${r - 1} l ON l.node = e.v
           |        GROUP BY e.u, l.label),
           |lp$r AS (SELECT u AS node, label FROM (
           |        SELECT u, label,
           |          row_number() OVER (PARTITION BY u ORDER BY cnt DESC, label) AS rk
           |        FROM lpv$r) WHERE rk = 1)${if (r < iters) "," else ""}
           |""".stripMargin)
    }
    sb.toString.trim.stripSuffix(",")
  }
}
