package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Assortativity, KCenter, KCore, LabelProp, MaxCoverage, Modularity, TriangleCount}

/** Dup-candidate-graph analytics: per-node triangle counts /
  * clustering coefficients (C105), k-core decomposition (C109), and
  * the greedy k-center coreset traversal over embeddings (C121).
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** k for the candidate-graph core (the sf0.01 anchor graph peels
    * 3 rounds to a 334-node 30-core — a real fixpoint, not a no-op).
    */
  val CoreK = 30

  /** Coreset size for the k-center traversal. */
  val KCenters = 8

  /** Synchronous label-propagation rounds (C129). */
  val LpIters = 3

  /** C143 greedy max-coverage budget. */
  val CoverK = 8

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C105: per-node triangle counts + clustering coefficients over
    // the rare-shingle candidate graph (clique-vs-chain diagnostic).
    "q_triangles" -> { (s, dir) =>
      val edges = TriangleCount.anchorEdges(t(s, dir, "documents"),
        col("doc_id"), col("text"), shingleK = 3, maxDf = 10)
      TriangleCount.nodeStats(edges).orderBy(col("node"))
    },

    // C109: the unique 30-core of the rare-shingle candidate graph —
    // high-precision dup-community seeds; chains/stars peel away.
    "q_kcore" -> { (s, dir) =>
      val edges = TriangleCount.anchorEdges(t(s, dir, "documents"),
        col("doc_id"), col("text"), shingleK = 3, maxDf = 10)
      KCore.core(edges, CoreK).orderBy(col("node"))
    },

    // C121: 8 maximally-spread exemplar embeddings (greedy Gonzalez)
    // with selection-time radii and final coverage counts.
    "q_kcenter" -> { (s, dir) =>
      KCenter.select(t(s, dir, "embeddings"), col("vec_id"), col("embedding"),
        k = KCenters)
    },

    // C129: label-propagation communities over the rare-shingle
    // candidate graph — denser than q_dup_clusters' components (a
    // bridge edge can't glue two dup families), 3 synchronous rounds.
    "q_label_prop" -> { (s, dir) =>
      val edges = TriangleCount.anchorEdges(t(s, dir, "documents"),
        col("doc_id"), col("text"), shingleK = 3, maxDf = 10)
      LabelProp.communities(edges, iters = LpIters).orderBy(col("node"))
    },

    // C140: Newman modularity of the C129 partition — per-community
    // intra-edge/degree-mass rollup + contribution; the go/no-go
    // score before trusting LPA clusters as retention units.
    "q_modularity" -> { (s, dir) =>
      val edges = TriangleCount.anchorEdges(t(s, dir, "documents"),
        col("doc_id"), col("text"), shingleK = 3, maxDf = 10)
      Modularity.communityStats(edges, LabelProp.communities(edges, iters = LpIters))
    },

    // C143: greedy maximum-coverage — 8 docs that together cover the
    // most distinct corpus shingles (pure set coverage; the
    // facility-location complement of C121/C134).
    "q_max_coverage" -> { (s, dir) =>
      MaxCoverage.select(t(s, dir, "documents"), col("doc_id"), col("text"), k = CoverK)
    },

    // C144: degree assortativity — hub-mesh vs star-shape structural
    // health of the candidate graph (exact decimal moment sums).
    "q_assortativity" -> { (s, dir) =>
      Assortativity.global(TriangleCount.anchorEdges(t(s, dir, "documents"),
        col("doc_id"), col("text"), shingleK = 3, maxDf = 10))
    }
  )

  private val h60: String => String =
    v => s"('0x' || substr(md5(CAST($v AS VARCHAR)), 1, 15))::BIGINT"

  /** Shared CTE chain: documents -> rare-shingle candidate edges
    * (the q_triangles graph).
    */
  private val edgesCte =
    s"""tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
       |        FROM documents),
       |sh AS (SELECT doc_id,
       |         list_distinct(CASE WHEN len(toks) >= 3
       |           THEN list_transform(range(1, len(toks) - 1),
       |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |           ELSE [array_to_string(toks, ' ')] END) AS shingles
       |       FROM tok),
       |e AS (SELECT DISTINCT doc_id, ${h60("u.s")} AS h
       |      FROM sh, unnest(sh.shingles) AS u(s)),
       |rare AS (SELECT h FROM e GROUP BY h HAVING count(*) BETWEEN 2 AND 10),
       |anch AS (SELECT e.doc_id, e.h FROM e JOIN rare USING (h)),
       |ed AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |       FROM anch a JOIN anch b ON a.h = b.h AND a.doc_id < b.doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(

    "q_triangles" ->
      s"""WITH ${PipelineQueries.shinglesCteDocs},
         |e AS (SELECT DISTINCT doc_id, ${PipelineQueries.hash60("u.s")} AS h
         |      FROM sh, unnest(sh.shingles) AS u(s)),
         |rare AS (SELECT h FROM e GROUP BY h HAVING count(*) BETWEEN 2 AND 10),
         |anch AS (SELECT e.doc_id, e.h FROM e JOIN rare USING (h)),
         |ed AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |       FROM anch a JOIN anch b ON a.h = b.h AND a.doc_id < b.doc_id),
         |deg AS (SELECT node, count(*) AS degree
         |        FROM (SELECT a AS node FROM ed UNION ALL SELECT b AS node FROM ed) u
         |        GROUP BY node),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |        FROM ed e1
         |        JOIN ed e2 ON e2.a = e1.b
         |        JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
         |pn AS (SELECT node, count(*) AS nt
         |       FROM (SELECT x AS node FROM tri UNION ALL SELECT y AS node FROM tri
         |             UNION ALL SELECT z AS node FROM tri) u
         |       GROUP BY node)
         |SELECT deg.node, CAST(deg.degree AS BIGINT) AS degree,
         |  CAST(coalesce(pn.nt, 0) AS BIGINT) AS n_triangles,
         |  CASE WHEN deg.degree >= 2
         |    THEN round(2.0 * coalesce(pn.nt, 0) / (deg.degree * (deg.degree - 1)), 4)
         |    ELSE 0.0 END AS clustering
         |FROM deg LEFT JOIN pn USING (node)
         |ORDER BY node""".stripMargin,

    "q_kcore" ->
      s"""WITH RECURSIVE $edgesCte,
         |und AS (SELECT a, b FROM ed UNION ALL SELECT b AS a, a AS b FROM ed),
         |alive(round, node) AS (
         |  SELECT 0 AS round, t.node FROM (SELECT DISTINCT a AS node FROM und) t
         |  UNION ALL
         |  SELECT x.round + 1, x.node
         |  FROM alive x
         |  JOIN (SELECT u.a AS node, count(*) AS deg
         |        FROM und u JOIN alive p ON p.node = u.a
         |        JOIN alive q ON q.node = u.b
         |        GROUP BY u.a) d ON d.node = x.node
         |  WHERE d.deg >= $CoreK
         |    AND EXISTS (
         |      SELECT 1 FROM alive p2
         |      LEFT JOIN (SELECT u.a AS node, count(*) AS deg
         |                 FROM und u JOIN alive p ON p.node = u.a
         |                 JOIN alive q ON q.node = u.b
         |                 GROUP BY u.a) dd ON dd.node = p2.node
         |      WHERE coalesce(dd.deg, 0) < $CoreK)),
         |fin AS (SELECT node FROM alive
         |        WHERE round = (SELECT max(round) FROM alive))
         |SELECT f.node, CAST(count(*) AS BIGINT) AS core_degree
         |FROM fin f JOIN und u ON u.a = f.node JOIN fin g ON g.node = u.b
         |GROUP BY f.node HAVING count(*) >= $CoreK
         |ORDER BY f.node""".stripMargin,

    "q_kcenter" -> KCenter.selectSql(KCenters),

    "q_label_prop" ->
      s"""WITH $edgesCte,
         |${LabelProp.communitiesCtes(LpIters)}
         |SELECT node, label AS community FROM lp$LpIters ORDER BY node""".stripMargin,

    "q_modularity" ->
      s"""WITH $edgesCte,
         |${LabelProp.communitiesCtes(LpIters)},
         |lab AS (SELECT node, label FROM lp$LpIters),
         |mm AS (SELECT count(*) AS m FROM ed),
         |deg AS (SELECT node, count(*) AS deg
         |        FROM (SELECT a AS node FROM ed UNION ALL SELECT b FROM ed) u
         |        GROUP BY node),
         |dc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_nodes,
         |         CAST(sum(deg) AS BIGINT) AS degree_sum
         |       FROM lab JOIN deg USING (node) GROUP BY label),
         |ec AS (SELECT la.label, CAST(count(*) AS BIGINT) AS intra_edges
         |       FROM ed JOIN lab la ON la.node = ed.a
         |       JOIN lab lb ON lb.node = ed.b
         |       WHERE la.label = lb.label GROUP BY la.label)
         |SELECT dc.label AS community, dc.n_nodes,
         |  coalesce(ec.intra_edges, 0) AS intra_edges, dc.degree_sum,
         |  round(CAST(coalesce(ec.intra_edges, 0) AS DOUBLE) / mm.m
         |    - (CAST(dc.degree_sum AS DOUBLE) / (mm.m * 2))
         |      * (CAST(dc.degree_sum AS DOUBLE) / (mm.m * 2)), 6) AS q_contrib
         |FROM dc LEFT JOIN ec USING (label), mm
         |ORDER BY community""".stripMargin,

    "q_max_coverage" ->
      s"""WITH ${PipelineQueries.shinglesCteDocs},
         |${MaxCoverage.selectSql(CoverK)}""".stripMargin,

    "q_assortativity" ->
      s"""WITH $edgesCte,
         |${Assortativity.globalSqlTail}
         |SELECT n_nodes, n_edges, assortativity FROM asst""".stripMargin
  )
}
