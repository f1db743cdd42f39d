package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Decontaminate, Dedup, HardNegatives, QualityClassifier, Sampling, Selection, Splits, TextAnalysis}

/** Round-7 capability queries: leakage-safe cluster splits,
  * hard-negative mining, token-budget corpus selection, and bloom-
  * prefiltered benchmark decontamination. Oracle rules per SURVEY §4.
  */
object Round7Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  val SplitFractions: Seq[(String, Double)] =
    Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
  val HnK = 50
  val HnNeg = 20
  val TokenBudget = 20000L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C58: leakage-safe splits — near-dup clusters (the C21 closure
    // over the C4 pair graph) assigned train/valid/test as units.
    "q_cluster_split" -> { (s, dir) =>
      val corpus = TextQueries.docsWithPlantedDups(s, dir)
      val pairs = Dedup.ngramJaccard(corpus, col("doc_id"), col("text"),
          blockBy = col("doc_id") % 1000000L, shingleK = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      Splits.clusterSplit(corpus, col("doc_id"), pairs, SplitFractions)
        .orderBy(col("doc_id"))
    },

    // C59: hard negatives — the q_ann_batch neighborhood minus
    // deterministic mod-keyed qrels, re-ranked contiguously.
    "q_hard_negatives" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val qids = Seq(0L, 1L, 2L)
      val queries = e.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val corpus = e.filter(!col("vec_id").isin(qids: _*))
      val qrels = e.filter(pmod(col("vec_id"), lit(25L)) < 3 && !col("vec_id").isin(qids: _*))
        .select(pmod(col("vec_id"), lit(25L)).cast("bigint").as("query_id"),
          col("vec_id").as("doc_id"))
      HardNegatives.mine(corpus, col("vec_id"), col("embedding"),
          queries, qrels, k = HnK, nNeg = HnNeg)
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 4).as("cos_sim"), col("neg_rank"))
        .orderBy(col("query_id"), col("vec_id"))
    },

    // C60: token-budget selection — best-quality-first greedy fill,
    // integer scores (C41 milli-logits) and exact integer prefix sums.
    "q_token_budget" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val scored = QualityClassifier.score(d, col("doc_id"), col("text"))
        .select(col("doc_id"), col("logit_milli"))
      val toks = d.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_toks"))
      Selection.tokenBudget(scored.join(toks, "doc_id"),
          col("doc_id"), col("logit_milli"), col("n_toks"), TokenBudget)
        .orderBy(col("doc_id"))
    },

    // C61: hard decontamination — the bloom prefilter + exact confirm
    // provably equals the plain exact anti-join the oracle runs.
    "q_decontaminate" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val eval = Sampling.hashSample(d, col("doc_id"), PipelineQueries.EvalFraction)
      Decontaminate.cleanDocs(d, col("doc_id"), col("text"),
          eval, col("text"), shingleK = 3)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }
  )

  val oracles: Map[String, String] = Map(

    "q_cluster_split" -> {
      val splitCase = graft.ops.Sampling.assignSplitSql(
        "CAST(cluster_id AS VARCHAR)", SplitFractions)
      s"""WITH RECURSIVE ${TextQueries.allDocsCte},
         |${TextQueries.shinglesCte},
         |prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |        FROM sh a JOIN sh b
         |          ON (a.doc_id % 1000000) = (b.doc_id % 1000000) AND a.doc_id < b.doc_id
         |        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         |              / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM prs
         |          UNION SELECT id_b, id_a FROM prs),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src),
         |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         |assigned AS (
         |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
         |  FROM all_docs d LEFT JOIN comp c USING (doc_id))
         |SELECT doc_id, cluster_id, $splitCase AS split
         |FROM assigned ORDER BY doc_id""".stripMargin
    },

    "q_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id IN (0, 1, 2)),
         |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |      FROM embeddings WHERE vec_id NOT IN (0, 1, 2)),
         |qrels AS (SELECT vec_id % 25 AS query_id, vec_id AS doc_id
         |          FROM embeddings WHERE vec_id % 25 < 3 AND vec_id NOT IN (0, 1, 2)),
         |s AS (SELECT q.query_id, c.vec_id,
         |        list_cosine_similarity(c.v, q.qv) AS cos_sim
         |      FROM c, q),
         |r AS (SELECT query_id, vec_id, cos_sim,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rk
         |      FROM s),
         |topk AS (SELECT query_id, vec_id, cos_sim FROM r WHERE rk <= $HnK),
         |negs AS (SELECT t.query_id, t.vec_id, t.cos_sim
         |         FROM topk t LEFT JOIN qrels p
         |           ON t.query_id = p.query_id AND t.vec_id = p.doc_id
         |         WHERE p.doc_id IS NULL),
         |rr AS (SELECT query_id, vec_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS neg_rank
         |       FROM negs)
         |SELECT query_id, vec_id, round(cos_sim, 4) AS cos_sim,
         |  CAST(neg_rank AS BIGINT) AS neg_rank
         |FROM rr WHERE neg_rank <= $HnNeg ORDER BY query_id, vec_id""".stripMargin,

    "q_token_budget" ->
      s"""WITH ${QualityClassifier.scoreSql("documents")},
         |toks AS (SELECT doc_id, ${TextAnalysis.tokenCountSql("text")} AS n_toks
         |         FROM documents),
         |d AS (SELECT q.doc_id, q.logit_milli AS score, t.n_toks
         |      FROM qscored q JOIN toks t USING (doc_id)),
         |p AS (SELECT doc_id, score, n_toks AS n_tokens,
         |        CAST(COALESCE(SUM(n_toks) OVER (ORDER BY score DESC, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |      FROM d)
         |SELECT doc_id, score, n_tokens, cum_before
         |FROM p WHERE cum_before < $TokenBudget ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      s"""WITH ${PipelineQueries.shinglesCteDocs},
         |vocab AS (SELECT DISTINCT ${PipelineQueries.hash60("u.s")} AS shash
         |          FROM sh, unnest(sh.shingles) AS u(s)
         |          WHERE ${PipelineQueries.hash60("sh.doc_id")} < ${PipelineQueries.evalThreshold}),
         |dirty AS (SELECT DISTINCT sh.doc_id
         |          FROM sh, unnest(sh.shingles) AS u(s)
         |          JOIN vocab ON ${PipelineQueries.hash60("u.s")} = vocab.shash)
         |SELECT d.doc_id, d.n_chars
         |FROM documents d LEFT JOIN dirty USING (doc_id)
         |WHERE dirty.doc_id IS NULL
         |ORDER BY d.doc_id""".stripMargin
  )
}
