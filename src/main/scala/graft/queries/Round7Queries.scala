package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Calibration, Decontaminate, Dedup, EpochShuffle, Features, HardNegatives, Novelty, QualityClassifier, Quantization, Sampling, Selection, Splits, SystematicSampling, TextAnalysis}

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
  val PpsK = 40L
  val ShuffleEpochs: Seq[Int] = Seq(0, 1)
  val ShuffleShards = 4
  val GroupTopK = 5
  val SnippetToks = 45
  val QtK = 20
  val BowDim = 64
  val EmbDim = 64

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C58: leakage-safe splits — near-dup clusters (the C21 closure
    // over the C4 pair graph) assigned train/valid/test as units.
    "q_cluster_split" -> { (s, dir) =>
      val corpus = TextQueries.docsWithPlantedDups(s, dir)
      // prefix blocking, not id-modulus: see q_dedup_ngram — modulus
      // keys collapse replica-derived corpora into quadratic blocks.
      val pairs = Dedup.ngramJaccard(corpus, col("doc_id"), col("text"),
          blockBy = TextQueries.prefixBlock(col("text")), shingleK = 3, threshold = 0.5)
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
    },

    // C62: systematic PPS sampling — token-count weights, exact
    // integer tick arithmetic on a hash-randomized order.
    "q_systematic_sample" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val toks = d.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_toks"))
      SystematicSampling.sample(toks, col("doc_id"), col("n_toks"), PpsK)
        .orderBy(col("doc_id"))
    },

    // C63: per-epoch training order + contiguous loader shards,
    // distributed rank (never a whole-epoch single-partition window).
    "q_epoch_shuffle" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      EpochShuffle.shuffle(d, col("doc_id"), ShuffleEpochs, ShuffleShards)
        .orderBy(col("epoch"), col("position"))
    },

    // C64: corpus-unique shingle fraction — the corpus-level
    // boilerplate signal pair-wise dedup cannot see.
    "q_novelty" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      Novelty.score(d, col("doc_id"), col("text"), shingleK = 3)
        .orderBy(col("doc_id"))
    },

    // C65: normalized exact dedup — canonical text key (lowercase,
    // punctuation strip, whitespace collapse) between C1 and MinHash.
    "q_normalized_dedup" -> { (s, dir) =>
      Dedup.normalizedExact(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("keep_id"))
    },

    // C66: per-group bounded top-k — heap aggregate, shuffle carries
    // ≤ k pairs per (task, group) instead of every row to a window.
    "q_group_topk" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(graft.plans.TopKAgg.topK(col("n_chars"), col("doc_id"), GroupTopK).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("bigint").as("rank"),
          col("col.id").as("doc_id"), col("col.score").as("n_chars"))
        .orderBy(col("lang"), col("rank"))
    },

    // C67: containment pairs over planted sub-documents — every 20th
    // doc's 45-token prefix re-enters as a snippet doc; its shingle
    // set is contained in the original even though Jaccard is low.
    "q_containment" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val snippets = d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          array_join(slice(split(trim(lower(col("text"))), "\\s+"), 1, SnippetToks), " ").as("text"))
      val all = d.select(col("doc_id"), col("text")).union(snippets)
      Dedup.containment(all, col("doc_id"), col("text"),
          shingleK = 3, maxDf = 10, threshold = 0.8)
        .select(col("id_a"), col("id_b"), col("n_common"), col("size_a"),
          col("size_b"), round(col("containment"), 4).as("containment"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // C68: corpus-calibrated per-dimension int8 quantization — the
    // cross-vector-comparable quantizer (per-row max-abs scales are
    // not), emitted as comma-joined ints (engine-stable formatting).
    "q_quantize_cal" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cal = Quantization.fitMinMax(e, col("embedding"))
      Quantization.quantize(e, col("vec_id"), col("embedding"), cal)
        .select(col("vec_id"),
          array_join(transform(col("qvec"), x => x.cast("string")), ",").as("q8_cal"))
        .orderBy(col("vec_id"))
    },

    // C68b: top-k search IN the quantized domain — exact integer dot
    // products (deterministic under any partitioning), bounded-heap
    // per-query combiner instead of a corpus-wide window.
    "q_quantized_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cal = Quantization.fitMinMax(e, col("embedding"))
      val q = Quantization.quantize(e, col("vec_id"), col("embedding"), cal)
      val qids = Seq(0L, 1L, 2L)
      val queries = q.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("query_id"), col("qvec"))
      Quantization.quantizedTopK(q.filter(!col("vec_id").isin(qids: _*)), queries, QtK)
        .orderBy(col("query_id"), col("rank"))
    },

    // C70: per-language quality calibration — percent_rank within
    // lang via the distributed prefix device (no whole-lang window),
    // keep the top half of each language.
    "q_quality_calibrate" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val scored = d.select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_toks"))
      Calibration.rankNormalize(scored, col("doc_id"), col("lang"), col("n_toks"))
        .filter(col("pct") >= 0.5)
        .select(col("doc_id"), col("grp").as("lang"), col("score").as("n_toks"),
          round(col("pct"), 6).as("pct"))
        .orderBy(col("doc_id"))
    },

    // C71: hashing-trick bag-of-words — vocabulary-free fixed-dim
    // features; sparse (doc, bucket, cnt) form for the oracle.
    "q_hashed_bow" -> { (s, dir) =>
      Features.hashedBow(t(s, dir, "documents"), col("doc_id"), col("text"), BowDim)
        .orderBy(col("doc_id"), col("bucket"))
    }
  )

  val oracles: Map[String, String] = Map(

    "q_cluster_split" -> {
      val splitCase = graft.ops.Sampling.assignSplitSql(
        "CAST(cluster_id AS VARCHAR)", SplitFractions)
      s"""WITH RECURSIVE ${TextQueries.allDocsCte},
         |${TextQueries.shinglesCte},
         |blk AS (SELECT doc_id, ${TextQueries.prefixBlockSql("text")} AS block FROM all_docs),
         |prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |        FROM blk ba JOIN blk bb ON bb.block = ba.block AND ba.doc_id < bb.doc_id
         |        JOIN sh a ON a.doc_id = ba.doc_id
         |        JOIN sh b ON b.doc_id = bb.doc_id
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
         |ORDER BY d.doc_id""".stripMargin,

    "q_systematic_sample" -> {
      val tEnd = SystematicSampling.ticksBeforeSql("cum_before + w", PpsK, "total")
      val tStart = SystematicSampling.ticksBeforeSql("cum_before", PpsK, "total")
      s"""WITH toks AS (SELECT doc_id, ${TextAnalysis.tokenCountSql("text")} AS w
         |              FROM documents),
         |h AS (SELECT doc_id, CAST(w AS BIGINT) AS w,
         |        ${PipelineQueries.hash60("doc_id")} AS hkey
         |      FROM toks),
         |p AS (SELECT doc_id, w,
         |        CAST(COALESCE(SUM(w) OVER (ORDER BY hkey, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         |        CAST(SUM(w) OVER () AS BIGINT) AS total
         |      FROM h),
         |sel AS (SELECT doc_id, w AS weight, cum_before,
         |          CAST(($tEnd) - ($tStart) AS BIGINT) AS n_sel
         |        FROM p)
         |SELECT doc_id, weight, cum_before, n_sel
         |FROM sel WHERE n_sel > 0 ORDER BY doc_id""".stripMargin
    },

    "q_epoch_shuffle" ->
      s"""WITH e AS (SELECT * FROM (VALUES ${ShuffleEpochs.map(e => s"($e)").mkString(", ")}) AS t(epoch)),
         |r AS (SELECT e.epoch, d.doc_id,
         |        ${PipelineQueries.hash60("CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)")} AS hkey
         |      FROM documents d CROSS JOIN e),
         |p AS (SELECT epoch, doc_id,
         |        CAST(row_number() OVER (PARTITION BY epoch ORDER BY hkey, doc_id) - 1 AS BIGINT) AS position,
         |        (SELECT count(*) FROM documents) AS n
         |      FROM r)
         |SELECT epoch, doc_id, position,
         |  CAST((position * $ShuffleShards) // n AS INTEGER) AS shard,
         |  CAST(position - ((position * $ShuffleShards) // n * n + ${ShuffleShards - 1}) // $ShuffleShards AS BIGINT) AS pos_in_shard
         |FROM p ORDER BY epoch, position""".stripMargin,

    "q_novelty" ->
      s"""WITH ${PipelineQueries.shinglesCteDocs},
         |ex AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
         |         ${PipelineQueries.hash60("u.s")} AS shash
         |       FROM sh, unnest(sh.shingles) AS u(s)),
         |dfc AS (SELECT shash, count(*) AS df FROM ex GROUP BY shash),
         |agg AS (SELECT ex.doc_id, ex.n_shingles,
         |          SUM(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS n_unique
         |        FROM ex JOIN dfc USING (shash)
         |        GROUP BY ex.doc_id, ex.n_shingles)
         |SELECT doc_id, n_shingles, CAST(n_unique AS BIGINT) AS n_unique,
         |  CASE WHEN n_shingles > 0
         |    THEN round(CAST(n_unique AS DOUBLE) / n_shingles, 4)
         |    ELSE 0.0 END AS novelty
         |FROM agg ORDER BY doc_id""".stripMargin,

    "q_normalized_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        |  count(DISTINCT md5(text)) AS n_raw_variants
        |FROM documents
        |GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))
        |ORDER BY keep_id""".stripMargin,

    "q_group_topk" ->
      s"""SELECT lang, rank, doc_id, n_chars FROM (
         |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank
         |  FROM documents) t
         |WHERE rank <= $GroupTopK ORDER BY lang, rank""".stripMargin,

    "q_containment" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id,
         |    array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[1:$SnippetToks], ' ') AS text
         |  FROM documents WHERE doc_id % 20 = 0),
         |${TextQueries.shinglesCte},
         |e AS (SELECT DISTINCT doc_id, ${PipelineQueries.hash60("u.s")} AS h
         |      FROM sh, unnest(sh.shingles) AS u(s)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
         |rare AS (SELECT h FROM e GROUP BY h HAVING count(*) BETWEEN 2 AND 10),
         |anch AS (SELECT e.doc_id, e.h FROM e JOIN rare USING (h)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM anch a JOIN anch b ON a.h = b.h AND a.doc_id < b.doc_id),
         |common AS (SELECT c.id_a, c.id_b, count(*) AS n_common
         |           FROM cand c
         |           JOIN e ea ON ea.doc_id = c.id_a
         |           JOIN e eb ON eb.doc_id = c.id_b AND eb.h = ea.h
         |           GROUP BY c.id_a, c.id_b)
         |SELECT m.id_a, m.id_b, m.n_common, sa.sz AS size_a, sb.sz AS size_b,
         |  round(CAST(m.n_common AS DOUBLE) / least(sa.sz, sb.sz), 4) AS containment
         |FROM common m
         |JOIN sizes sa ON sa.doc_id = m.id_a
         |JOIN sizes sb ON sb.doc_id = m.id_b
         |WHERE CAST(m.n_common AS DOUBLE) / least(sa.sz, sb.sz) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    "q_quantize_cal" ->
      s"""WITH ex AS (SELECT vec_id, u.i AS dim, CAST(embedding AS DOUBLE[])[u.i] AS v
         |            FROM embeddings, unnest(range(1, ${EmbDim + 1})) AS u(i)),
         |cal AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM ex GROUP BY dim)
         |SELECT vec_id,
         |  string_agg(CAST(CASE WHEN cal.hi = cal.lo THEN 0
         |    ELSE CAST(round((ex.v - cal.lo) * 254.0 / (cal.hi - cal.lo)) AS INTEGER) - 127 END
         |    AS VARCHAR), ',' ORDER BY ex.dim) AS q8_cal
         |FROM ex JOIN cal USING (dim)
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_quantized_topk" ->
      s"""WITH ex AS (SELECT vec_id, u.i AS dim, CAST(embedding AS DOUBLE[])[u.i] AS v
         |            FROM embeddings, unnest(range(1, ${EmbDim + 1})) AS u(i)),
         |cal AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM ex GROUP BY dim),
         |q AS (SELECT vec_id, dim,
         |        CASE WHEN cal.hi = cal.lo THEN 0
         |          ELSE CAST(round((ex.v - cal.lo) * 254.0 / (cal.hi - cal.lo)) AS INTEGER) - 127
         |        END AS qv
         |      FROM ex JOIN cal USING (dim)),
         |s AS (SELECT qq.vec_id AS query_id, c.vec_id,
         |        CAST(SUM(CAST(c.qv AS BIGINT) * qq.qv) AS BIGINT) AS iprod
         |      FROM q c JOIN q qq USING (dim)
         |      WHERE qq.vec_id IN (0, 1, 2) AND c.vec_id NOT IN (0, 1, 2)
         |      GROUP BY 1, 2),
         |r AS (SELECT query_id, vec_id, iprod,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY iprod DESC, vec_id) AS BIGINT) AS rank
         |      FROM s)
         |SELECT query_id, vec_id, iprod, rank
         |FROM r WHERE rank <= $QtK ORDER BY query_id, rank""".stripMargin,

    "q_quality_calibrate" ->
      s"""WITH sc AS (SELECT doc_id, lang,
         |              CAST(${TextAnalysis.tokenCountSql("text")} AS BIGINT) AS n_toks
         |            FROM documents),
         |r AS (SELECT doc_id, lang, n_toks,
         |        percent_rank() OVER (PARTITION BY lang ORDER BY n_toks, doc_id) AS pct
         |      FROM sc)
         |SELECT doc_id, lang, n_toks, round(pct, 6) AS pct
         |FROM r WHERE pct >= 0.5 ORDER BY doc_id""".stripMargin,

    "q_hashed_bow" ->
      s"""WITH tok AS (SELECT doc_id,
         |               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |             FROM documents),
         |b AS (SELECT doc_id, ${graft.ops.Features.bucketSql("tok", BowDim)} AS bucket
         |      FROM tok WHERE tok <> '')
         |SELECT doc_id, bucket, count(*) AS cnt
         |FROM b GROUP BY doc_id, bucket ORDER BY doc_id, bucket""".stripMargin
  )
}
