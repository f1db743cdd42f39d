package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, FeatureSelect, KCore, Profiler, RocCurve, SpatialJoin, TriangleCount}

/** Round-8 session-3 additions: k-core decomposition of the dup
  * candidate graph (C109), chi-square feature selection (C110),
  * ROC/PR curve points (C111), grid-blocked spatial radius join
  * (A50), Benford leading-digit audit (C112).
  */
object Round8cQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** k for the candidate-graph core (the sf0.01 anchor graph peels
    * 3 rounds to a 334-node 30-core — a real fixpoint, not a no-op).
    */
  val CoreK = 30

  /** Chi-square selection: noise floor + list depth. */
  val ChiMinDf = 5
  val ChiTopN = 40

  /** Spatial join: synthetic planar field side + radius. */
  val FieldSide = 1000000L
  val Radius = 5000L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C109: the unique 30-core of the rare-shingle candidate graph —
    // high-precision dup-community seeds; chains/stars peel away.
    "q_kcore" -> { (s, dir) =>
      val edges = TriangleCount.anchorEdges(t(s, dir, "documents"),
        col("doc_id"), col("text"), shingleK = 3, maxDf = 10)
      KCore.core(edges, CoreK).orderBy(col("node"))
    },

    // C110: top-40 tokens by chi-square association with the language
    // label — exact integer milli-chi2, no float addition order.
    "q_chi2_features" -> { (s, dir) =>
      FeatureSelect.chiSquare(t(s, dir, "documents"),
        col("doc_id"), col("text"), col("lang"),
        minDf = ChiMinDf, topN = ChiTopN)
    },

    // C111: ROC/PR sweep of "value predicts purchase" at integer
    // thresholds — one curve point per distinct floor(value).
    "q_roc_points" -> { (s, dir) =>
      RocCurve.points(t(s, dir, "events"),
          floor(col("value")), col("event_type") === "purchase")
        .orderBy(col("threshold"))
    },

    // A50: stop-proximity style radius self-join on a synthetic
    // integer planar field (deterministic per-customer coordinates);
    // the grid-blocked plan must equal the oracle's brute force.
    "q_spatial_join" -> { (s, dir) =>
      val pts = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        (Dedup.md5Hash60(concat(lit("px:"), col("c_custkey").cast("string")))
          % FieldSide).as("x"),
        (Dedup.md5Hash60(concat(lit("py:"), col("c_custkey").cast("string")))
          % FieldSide).as("y"))
      SpatialJoin.radiusSelfJoin(pts, Radius).orderBy(col("id_a"), col("id_b"))
    },

    // C112: Benford leading-digit audit over lineitem prices in
    // integer cents — fabricated-data smell test for the profiler.
    "q_benford" -> { (s, dir) =>
      Profiler.benfordAudit(t(s, dir, "lineitem"),
          floor(col("l_extendedprice") * 100).cast("bigint"))
        .orderBy(col("digit"))
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

    "q_chi2_features" ->
      s"""WITH pres AS (
         |  SELECT DISTINCT doc_id, lang AS cls, u.t AS token
         |  FROM documents,
         |       unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(t)
         |  WHERE u.t <> ''),
         |nn AS (SELECT count(*) AS n FROM documents),
         |ct AS (SELECT lang AS cls, count(*) AS n_c FROM documents GROUP BY lang),
         |pc AS (SELECT token, cls, count(*) AS df_c FROM pres GROUP BY token, cls),
         |dft AS (SELECT token, CAST(sum(df_c) AS BIGINT) AS df FROM pc GROUP BY token),
         |grid AS (SELECT d.token, d.df, c.cls, c.n_c, coalesce(pc.df_c, 0) AS df_c
         |         FROM dft d CROSS JOIN ct c
         |         LEFT JOIN pc ON pc.token = d.token AND pc.cls = c.cls),
         |terms AS (SELECT g.token, g.df, g.cls,
         |            CAST(nn.n AS HUGEINT) * g.df_c
         |              - CAST(g.df AS HUGEINT) * g.n_c AS dc,
         |            CAST(g.n_c AS HUGEINT) * g.df * (nn.n - g.df) AS denom
         |          FROM grid g, nn
         |          WHERE g.df >= $ChiMinDf AND g.df < nn.n),
         |scored AS (SELECT token, df,
         |             CAST(sum((1000 * dc * dc) // denom) AS BIGINT) AS chi2_milli
         |           FROM terms GROUP BY token, df),
         |tc AS (SELECT token, cls AS top_class,
         |         row_number() OVER (PARTITION BY token ORDER BY dc DESC, cls) AS rn
         |       FROM terms QUALIFY rn = 1),
         |ranked AS (SELECT s.token, s.df, s.chi2_milli, tc.top_class,
         |             CAST(row_number() OVER (
         |               ORDER BY s.chi2_milli DESC, s.token) AS BIGINT) AS rk
         |           FROM scored s JOIN tc USING (token))
         |SELECT token, df, chi2_milli, top_class, rk
         |FROM ranked WHERE rk <= $ChiTopN ORDER BY rk""".stripMargin,

    "q_roc_points" ->
      """WITH s AS (SELECT CAST(floor(value) AS BIGINT) AS threshold,
        |             (event_type = 'purchase') AS y FROM events),
        |g AS (SELECT threshold,
        |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |        CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
        |      FROM s GROUP BY threshold),
        |c AS (SELECT threshold, n_pos, n_neg,
        |        CAST(sum(n_pos) OVER (ORDER BY threshold DESC
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tp,
        |        CAST(sum(n_neg) OVER (ORDER BY threshold DESC
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_fp
        |      FROM g),
        |t AS (SELECT sum(n_pos) AS tot_pos, sum(n_neg) AS tot_neg FROM g)
        |SELECT threshold, n_pos, n_neg, cum_tp, cum_fp,
        |  round(CAST(cum_tp AS DOUBLE) / tot_pos, 4) AS tpr,
        |  round(CAST(cum_fp AS DOUBLE) / tot_neg, 4) AS fpr,
        |  round(CAST(cum_tp AS DOUBLE) / (cum_tp + cum_fp), 4) AS "precision"
        |FROM c, t ORDER BY threshold""".stripMargin,

    "q_spatial_join" -> {
      val px = h60("'px:' || CAST(c_custkey AS VARCHAR)")
      val py = h60("'py:' || CAST(c_custkey AS VARCHAR)")
      s"""WITH p AS (SELECT c_custkey AS id,
         |             $px % $FieldSide AS x, $py % $FieldSide AS y
         |           FROM customer)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
         |    AS dist2,
         |  round(sqrt(CAST((a.x - b.x) * (a.x - b.x)
         |    + (a.y - b.y) * (a.y - b.y) AS DOUBLE)), 4) AS dist
         |FROM p a JOIN p b ON a.id < b.id
         |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         |  <= ${Radius * Radius}
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q_benford" -> {
      val expVals = Profiler.BenfordMicro.zipWithIndex
        .map { case (m, i) => s"(${i + 1}, ${m})" }.mkString(", ")
      s"""WITH exp(digit, exp_micro) AS (VALUES $expVals),
         |u AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS u
         |      FROM lineitem WHERE floor(l_extendedprice * 100) > 0),
         |obs AS (SELECT CAST(substr(CAST(u AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         |          count(*) AS n
         |        FROM u GROUP BY 1),
         |t AS (SELECT sum(n) AS tot FROM obs)
         |SELECT e.digit, CAST(coalesce(obs.n, 0) AS BIGINT) AS n,
         |  CAST((1000000 * coalesce(obs.n, 0)) // t.tot AS BIGINT) AS obs_micro,
         |  CAST(e.exp_micro AS BIGINT) AS exp_micro,
         |  CAST(abs((1000000 * coalesce(obs.n, 0)) // t.tot - e.exp_micro)
         |    AS BIGINT) AS dev_micro
         |FROM exp e LEFT JOIN obs ON obs.digit = e.digit, t
         |ORDER BY e.digit""".stripMargin
    }
  )
}
