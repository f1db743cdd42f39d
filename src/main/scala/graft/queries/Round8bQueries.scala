package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Bm25, Privacy, RankFusion, SetSimJoin, Similarity, Splits, TriangleCount}

/** Round-8 session-2 additions: prefix-filtered exact set-similarity
  * join (C104), dup-graph triangle diagnostics (C105), hybrid
  * retrieval rank fusion (C106), k-anonymity audit (C107),
  * stratified k-fold assignment (C108).
  */
object Round8bQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Jaccard threshold (milli) for the set-similarity join. */
  val SetSimTau = 700

  /** RRF constant + fused list depth. */
  val RrfK0 = 60
  val RrfDepth = 20
  val RrfTopK = 10

  /** Hybrid queries: (query_id, lexical terms); the dense side uses
    * the embedding of vec_id = query_id.
    */
  val HybridQueries: Seq[(Long, String)] = Seq(
    0L -> "spark", 0L -> "table",
    1L -> "hash", 1L -> "merge",
    2L -> "window", 2L -> "sort")

  /** k-anonymity threshold and QI length-bucket width. */
  val AnonK = 5
  val AnonBucket = 256

  /** Cross-validation folds. */
  val KFolds = 5

  /** The set-sim fixture: corpus + exact copies of every 10th doc +
    * last-2-tokens-truncated copies of every 20th doc with >= 10
    * tokens (Jaccard (n-4)/(n-2) — high but < 1).
    */
  private def setSimCorpus(d: DataFrame): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    d.select(col("doc_id"), col("text"))
      .unionAll(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      .unionAll(d.filter(col("doc_id") % 20 === 0 && size(toks) >= 10)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          array_join(slice(toks, lit(1), size(toks) - 2), " ").as("text")))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C104: exact Jaccard >= 0.7 self-join via prefix filtering —
    // guaranteed-recall dedup without LSH's probabilistic miss.
    "q_setsim_join" -> { (s, dir) =>
      SetSimJoin.jaccardJoin(setSimCorpus(t(s, dir, "documents")),
          col("doc_id"), col("text"), shingleK = 3, tauMilli = SetSimTau)
        .orderBy(col("id_a"), col("id_b"))
    },

    // C105: per-node triangle counts + clustering coefficients over
    // the rare-shingle candidate graph (clique-vs-chain diagnostic).
    "q_triangles" -> { (s, dir) =>
      val edges = TriangleCount.anchorEdges(t(s, dir, "documents"),
        col("doc_id"), col("text"), shingleK = 3, maxDf = 10)
      TriangleCount.nodeStats(edges).orderBy(col("node"))
    },

    // C106: reciprocal-rank fusion of BM25 (lexical) and brute-force
    // cosine (dense) top-20 lists, top-10 fused per query.
    "q_rrf_fusion" -> { (s, dir) =>
      import s.implicits._
      val queryIds = HybridQueries.map(_._1).distinct
      val docs = t(s, dir, "documents").filter(!col("doc_id").isin(queryIds: _*))
      val emb = t(s, dir, "embeddings")
      val lex = Bm25.topK(docs, col("doc_id"), col("text"),
          HybridQueries.toDF("query_id", "term"), topK = RrfDepth)
        .select(col("query_id"), col("doc_id"), col("rk").as("rank"))
      val denseQ = emb.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").cast("bigint").as("query_id"), col("embedding").as("qv"))
      val wD = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      val dense = Similarity.bruteForceTopKBatch(
          emb.filter(!col("vec_id").isin(queryIds: _*)),
          col("vec_id"), col("embedding"), denseQ, k = RrfDepth)
        .withColumn("rank", row_number().over(wD).cast("bigint"))
        .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
      RankFusion.fuse(lex, dense, k0 = RrfK0, topK = RrfTopK)
        .orderBy(col("query_id"), col("rk"))
    },

    // C107: k-anonymity equivalence classes over (lang, length
    // bucket) with source as the sensitive attribute (l-diversity).
    "q_k_anonymity" -> { (s, dir) =>
      Privacy.kAnonymity(t(s, dir, "documents"),
          Seq("lang" -> col("lang"),
            "chars_bucket" -> expr(s"n_chars DIV $AnonBucket")),
          col("source"), AnonK)
        .orderBy(col("lang"), col("chars_bucket"))
    },

    // C108: stratified 5-fold assignment — folds exactly balanced
    // within every language stratum.
    "q_kfold" -> { (s, dir) =>
      Splits.stratifiedKFold(t(s, dir, "documents"),
          col("doc_id"), col("lang"), KFolds)
        .orderBy(col("doc_id"))
    }
  )

  private val truncToks =
    "string_split_regex(trim(lower(text)), '\\s+')"

  val oracles: Map[String, String] = Map(

    "q_setsim_join" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 3000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 4000000 AS doc_id,
         |    array_to_string(($truncToks)[1:len($truncToks)-2], ' ') AS text
         |  FROM documents WHERE doc_id % 20 = 0 AND len($truncToks) >= 10),
         |${TextQueries.shinglesCte},
         |e AS (SELECT DISTINCT doc_id, ${PipelineQueries.hash60("u.s")} AS h
         |      FROM sh, unnest(sh.shingles) AS u(s)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
         |dfreq AS (SELECT h, count(*) AS df FROM e GROUP BY h),
         |rnk AS (SELECT e.doc_id, e.h, s.sz,
         |          row_number() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.h) AS rnk
         |        FROM e JOIN dfreq d USING (h) JOIN sizes s USING (doc_id)),
         |pref AS (SELECT h, doc_id, sz FROM rnk
         |         WHERE rnk <= sz - (sz * $SetSimTau + 999) // 1000 + 1),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM pref a JOIN pref b ON a.h = b.h AND a.doc_id < b.doc_id
         |         WHERE a.sz * 1000 >= b.sz * $SetSimTau
         |           AND b.sz * 1000 >= a.sz * $SetSimTau),
         |common AS (SELECT c.id_a, c.id_b, count(*) AS n_common
         |           FROM cand c
         |           JOIN e ea ON ea.doc_id = c.id_a
         |           JOIN e eb ON eb.doc_id = c.id_b AND eb.h = ea.h
         |           GROUP BY c.id_a, c.id_b)
         |SELECT m.id_a, m.id_b, CAST(m.n_common AS BIGINT) AS n_common,
         |  CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
         |  round(CAST(m.n_common AS DOUBLE) / (sa.sz + sb.sz - m.n_common), 4) AS jaccard
         |FROM common m
         |JOIN sizes sa ON sa.doc_id = m.id_a
         |JOIN sizes sb ON sb.doc_id = m.id_b
         |WHERE m.n_common * 1000 >= (sa.sz + sb.sz - m.n_common) * $SetSimTau
         |ORDER BY id_a, id_b""".stripMargin,

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

    "q_rrf_fusion" -> {
      val values = HybridQueries.map { case (q, tm) => s"($q, '$tm')" }.mkString(", ")
      val qids = HybridQueries.map(_._1).distinct.mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $values),
         |d AS (SELECT doc_id, text FROM documents WHERE doc_id NOT IN ($qids)),
         |toks AS (SELECT doc_id, u.term
         |         FROM d, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(term)),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |dl AS (SELECT doc_id, ${graft.ops.TextAnalysis.tokenCountSql("text")} AS dl FROM d),
         |stats AS (SELECT count(*) AS n_docs,
         |                 avg(${graft.ops.TextAnalysis.tokenCountSql("text")}) AS avgdl
         |          FROM d),
         |contrib AS (
         |  SELECT q.query_id, tf.doc_id,
         |         ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         |           * tf.tf * 2.2
         |           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS part
         |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
         |       CROSS JOIN stats JOIN q ON q.term = tf.term),
         |lexscore AS (SELECT query_id, doc_id, round(sum(part), 4) AS score
         |             FROM contrib GROUP BY query_id, doc_id),
         |lex AS (SELECT query_id, doc_id,
         |          CAST(row_number() OVER (PARTITION BY query_id
         |            ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
         |        FROM lexscore QUALIFY lex_rank <= $RrfDepth),
         |qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |       FROM embeddings WHERE vec_id IN ($qids)),
         |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |      FROM embeddings WHERE vec_id NOT IN ($qids)),
         |ds AS (SELECT qv.query_id, c.vec_id AS doc_id,
         |         list_cosine_similarity(c.v, qv.qv) AS cos_sim
         |       FROM c, qv),
         |dense AS (SELECT query_id, doc_id,
         |            CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS dense_rank
         |          FROM ds QUALIFY dense_rank <= $RrfDepth),
         |fused AS (
         |  SELECT coalesce(lex.query_id, dense.query_id) AS query_id,
         |         coalesce(lex.doc_id, dense.doc_id) AS doc_id,
         |         coalesce(lex.lex_rank, 0) AS lex_rank,
         |         coalesce(dense.dense_rank, 0) AS dense_rank
         |  FROM lex FULL OUTER JOIN dense
         |    ON lex.query_id = dense.query_id AND lex.doc_id = dense.doc_id),
         |scored AS (
         |  SELECT query_id, doc_id,
         |         CAST(lex_rank AS BIGINT) AS lex_rank,
         |         CAST(dense_rank AS BIGINT) AS dense_rank,
         |         CAST(CASE WHEN lex_rank > 0
         |                THEN ${RankFusion.Scale} // (lex_rank + $RrfK0) ELSE 0 END
         |              + CASE WHEN dense_rank > 0
         |                THEN ${RankFusion.Scale} // (dense_rank + $RrfK0) ELSE 0 END
         |           AS BIGINT) AS rrf_score
         |  FROM fused)
         |SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rk
         |FROM scored QUALIFY rk <= $RrfTopK
         |ORDER BY query_id, rk""".stripMargin
    },

    "q_k_anonymity" ->
      s"""SELECT lang, n_chars // $AnonBucket AS chars_bucket,
         |  CAST(count(*) AS BIGINT) AS class_size,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sensitive,
         |  CAST(CASE WHEN count(*) < $AnonK THEN 1 ELSE 0 END AS INTEGER) AS at_risk
         |FROM documents
         |GROUP BY lang, n_chars // $AnonBucket
         |ORDER BY lang, chars_bucket""".stripMargin,

    "q_kfold" ->
      s"""WITH r AS (SELECT doc_id, lang AS stratum,
         |             ('0x' || substr(md5('kfold:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hkey
         |           FROM documents)
         |SELECT doc_id, stratum,
         |  CAST((row_number() OVER (PARTITION BY stratum ORDER BY hkey, doc_id) - 1)
         |    % $KFolds AS INTEGER) AS fold
         |FROM r ORDER BY doc_id""".stripMargin
  )
}
