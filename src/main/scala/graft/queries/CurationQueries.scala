package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Allocation, Calibration, Dedup, DomainCuration, DomainReweight, EpochShuffle, ImportanceWeights, Outliers, PerplexityBuckets, QualityClassifier, Selection, Splits, SystematicSampling, TextAnalysis}

/** Corpus-curation / selection / mixing queries: domain-level
  * curation (C52), DSIR importance weighting (C53), leakage-safe
  * cluster splits (C58), token-budget selection (C60), systematic
  * PPS sampling (C62), per-epoch training order (C63), per-language
  * quality calibration (C69), Hamilton proportional stratified
  * sampling (C73), robust outlier gating (C79), CCNet perplexity
  * bucketing (C87), DoReMi reweighting (C92), the pipeline funnel
  * report (C97), and the script-composition gate (C98).
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Synthetic deterministic URL for the documents table (it carries
    * no URL column): doc_id-keyed host among 37 domains + a
    * source/doc path — identical construction in the twin.
    */
  private def docUrl: Column =
    concat(lit("https://d"), (col("doc_id") % 37).cast("string"),
      lit(".example.com/"), col("source"), lit("/"), col("doc_id").cast("string"))

  private val docUrlSql: String =
    "'https://d' || CAST(doc_id % 37 AS VARCHAR) || '.example.com/' || source || '/' || CAST(doc_id AS VARCHAR)"

  val DomainCap = 5
  val IwBuckets = 1024

  val SplitFractions: Seq[(String, Double)] =
    Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)

  /** C126 temporal split: 80% of the span trains, a 5%-of-span
    * embargo gap precedes the test cutoff. */
  val TimeSplitTrain = 800
  val TimeSplitEmbargo = 50
  val TokenBudget = 20000L
  val PpsK = 40L
  val ShuffleEpochs: Seq[Int] = Seq(0, 1)
  val ShuffleShards = 4
  val PropK = 60

  /** MAD multiples for the outlier gate, in milli-units (2500 = 2.5·MAD). */
  val OutlierKMilli = 2500L

  /** C97: language allowlist for the funnel fixture (a strict subset
    * of the corpus's five langs, so the language gate drops rows). */
  val FunnelLangs: Set[String] = Set("en", "de", "fr")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C52a: per-domain audit stats.
    "q_domain_stats" -> { (s, dir) =>
      val d = t(s, dir, "documents").withColumn("url", docUrl)
      DomainCuration.domainStats(d, col("url"), col("doc_id"), col("n_chars"))
        .orderBy(col("domain"))
    },

    // C52b: per-domain document cap (hash-ranked keep set).
    "q_domain_cap" -> { (s, dir) =>
      val d = t(s, dir, "documents").withColumn("url", docUrl)
      DomainCuration.capPerDomain(d, col("url"), col("doc_id"), maxDocs = DomainCap)
        .orderBy(col("domain"), col("doc_id"))
    },

    // C53: DSIR importance weights vs the src0 target domain.
    "q_importance_weights" -> { (s, dir) =>
      ImportanceWeights.weights(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("source") === "src0", buckets = IwBuckets)
        .orderBy(col("doc_id"))
    },

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

    // C126: temporal leakage-safe split — time cutoff + embargo gap
    // over the events stream, per event_type. One scalar min/max agg
    // broadcast, narrow assignment, bounded summary.
    "q_time_split" -> { (s, dir) =>
      Splits.timeSplit(t(s, dir, "events"), col("ts"), col("event_type"),
          trainPermille = TimeSplitTrain, embargoPermille = TimeSplitEmbargo)
        .orderBy(col("split"), col("group"))
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

    // C69: per-language quality calibration — percent_rank within
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

    // C73: Hamilton proportional stratified sample — global budget k
    // split across languages ∝ size with Σ alloc = k exactly, then
    // hash-ranked selection through the C66 bounded heap.
    "q_proportional_sample" -> { (s, dir) =>
      Allocation.proportionalSample(
          t(s, dir, "documents"), col("doc_id"), col("lang"), PropK)
        .orderBy(col("stratum"), col("rank"))
    },

    // C79: per-group robust outlier gate — median/MAD from the A40
    // distinct-value-histogram device, never a per-row group window.
    "q_robust_outliers" -> { (s, dir) =>
      Outliers.robustFlags(t(s, dir, "documents"),
          col("doc_id"), col("lang"), col("n_chars"), OutlierKMilli)
        .select(col("id").as("doc_id"), col("group").as("lang"),
          col("value").as("n_chars"), col("med"), col("mad"),
          col("robust_z_milli"), col("is_outlier"))
        .orderBy(col("doc_id"))
    },

    // C87: CCNet-style perplexity bucketing — KN-scored docs split
    // per language into head/middle/tail thirds via the
    // histogram-device NTILE (no per-row group window).
    "q_ppl_buckets" -> { (s, dir) =>
      PerplexityBuckets.bucketize(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // C92: DoReMi-style domain reweighting — one exponentiated-
    // gradient step over per-source cross-entropy, ppm weights from
    // exact integer numerators.
    "q_domain_reweight" -> { (s, dir) =>
      DomainReweight.step(t(s, dir, "documents"),
          col("source"), col("text"), etaMilli = 200L)
        .orderBy(col("source"))
    },

    // C97: pipeline funnel report — per-stage doc/token attrition
    // with first-failing-stage attribution, over the planted-dup
    // corpus; langs restricted so the language gate bites, prefix
    // dedup catches the planted near-dups.
    "q_funnel" -> { (s, dir) =>
      graft.ops.CorpusPipeline.funnel(
          TextQueries.docsWithPlantedDups(s, dir),
          graft.ops.CorpusPipeline.Config(
            langs = FunnelLangs, minQuality = 2, maxTopBigramFrac = 0.5,
            prefixDedupK = Some(5)))
        .orderBy(col("stage_rank"))
    },

    // C98: script-composition gate — single-pass codepoint-range
    // histogram (Latin/CJK/Cyrillic/Arabic/Devanagari/Hangul/digit/
    // space/other), zero shuffle; the mixed-script spam + mojibake
    // detector the stopword langid cannot be.
    "q_script_mix" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), graft.plans.ScriptMixExprOps.mix(col("text")).as("st"))
        .select(Seq(col("doc_id")) ++
          graft.plans.ScriptMixOps.fields.map(f => col(s"st.$f").as(f)): _*)
        .orderBy(col("doc_id"))
    }
  )

  val oracles: Map[String, String] = Map(

    "q_domain_stats" ->
      s"""WITH du AS (SELECT doc_id, n_chars, $docUrlSql AS url FROM documents),
         |dh AS (SELECT doc_id, n_chars,
         |         regexp_extract(url, '^[a-zA-Z]+://([^/]+)', 1) AS domain FROM du)
         |SELECT domain, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       min(doc_id) AS first_doc
         |FROM dh GROUP BY domain ORDER BY domain""".stripMargin,

    "q_domain_cap" ->
      s"""WITH du AS (SELECT doc_id, $docUrlSql AS url FROM documents),
         |dh AS (SELECT doc_id,
         |         regexp_extract(url, '^[a-zA-Z]+://([^/]+)', 1) AS domain FROM du),
         |dr AS (SELECT domain, doc_id,
         |         row_number() OVER (PARTITION BY domain
         |           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
         |             doc_id) AS rk
         |       FROM dh)
         |SELECT domain, doc_id FROM dr WHERE rk <= $DomainCap
         |ORDER BY domain, doc_id""".stripMargin,

    "q_importance_weights" ->
      s"""WITH ${ImportanceWeights.weightsSql("documents", "doc_id", "text",
            "source = 'src0'", IwBuckets)}
         |SELECT doc_id, n_tokens, weight_micro FROM iw ORDER BY doc_id""".stripMargin,

    "q_time_split" ->
      Splits.timeSplitSql(TimeSplitTrain, TimeSplitEmbargo),

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

    "q_quality_calibrate" ->
      s"""WITH sc AS (SELECT doc_id, lang,
         |              CAST(${TextAnalysis.tokenCountSql("text")} AS BIGINT) AS n_toks
         |            FROM documents),
         |r AS (SELECT doc_id, lang, n_toks,
         |        percent_rank() OVER (PARTITION BY lang ORDER BY n_toks, doc_id) AS pct
         |      FROM sc)
         |SELECT doc_id, lang, n_toks, round(pct, 6) AS pct
         |FROM r WHERE pct >= 0.5 ORDER BY doc_id""".stripMargin,

    "q_proportional_sample" ->
      s"""WITH cnt AS (SELECT lang AS stratum, count(*) AS n_h
         |             FROM documents GROUP BY lang),
         |tot AS (SELECT SUM(n_h) AS n_tot FROM cnt),
         |qa AS (SELECT stratum, n_h,
         |         ($PropK * n_h) // n_tot AS base,
         |         ($PropK * n_h) % n_tot AS rem
         |       FROM cnt, tot),
         |lo AS (SELECT $PropK - SUM(base) AS leftover FROM qa),
         |al AS (SELECT stratum, n_h,
         |         least(n_h, base + CASE
         |           WHEN row_number() OVER (ORDER BY rem DESC, stratum)
         |                <= (SELECT leftover FROM lo) THEN 1 ELSE 0 END) AS alloc
         |       FROM qa),
         |rk AS (SELECT lang AS stratum, doc_id,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY ${PipelineQueries.hash60("doc_id")}, doc_id) AS rank
         |       FROM documents)
         |SELECT r.stratum, r.doc_id, CAST(r.rank AS BIGINT) AS rank,
         |  CAST(a.alloc AS BIGINT) AS alloc, a.n_h
         |FROM rk r JOIN al a USING (stratum)
         |WHERE r.rank <= a.alloc
         |ORDER BY stratum, rank""".stripMargin,

    "q_robust_outliers" ->
      s"""WITH ${Outliers.robustFlagsSql("documents", "doc_id", "lang", "n_chars", OutlierKMilli)}
         |SELECT id AS doc_id, "group" AS lang, value AS n_chars,
         |  med, mad, robust_z_milli, is_outlier
         |FROM rof ORDER BY doc_id""".stripMargin,

    "q_ppl_buckets" ->
      s"""WITH ${PerplexityBuckets.bucketizeSql("documents")}
         |SELECT doc_id, lang, n_bigrams, avg_logprob, ppl_bucket
         |FROM pplb ORDER BY doc_id""".stripMargin,

    "q_domain_reweight" ->
      s"""WITH ${DomainReweight.stepSql("documents", etaMilli = 200L)}
         |SELECT source, n_tokens, ce_micro, boost_micro, weight_ppm
         |FROM drw ORDER BY source""".stripMargin,

    "q_funnel" -> {
      import graft.ops.TextAnalysis.{langIdSql, punctCountSql, tokenCountSql}
      val qSum =
        s"""(CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1 ELSE 0 END
           | + CASE WHEN ${tokenCountSql("text")} >= 20 THEN 1 ELSE 0 END
           | + CASE WHEN (${punctCountSql("text")}) * 10 <= length(text) THEN 1 ELSE 0 END)""".stripMargin
      val langList = FunnelLangs.toSeq.sorted.map(l => s"'$l'").mkString(", ")
      s"""WITH ${TextQueries.allDocsCte},
         |fnt AS (SELECT doc_id, text,
         |          string_split_regex(trim(lower(text)), '\\s+') AS toks
         |        FROM all_docs),
         |fnb AS (SELECT doc_id, text, toks,
         |          CASE WHEN len(toks) >= 2
         |            THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
         |            ELSE [] END AS bigrams
         |        FROM fnt),
         |fnr AS (SELECT doc_id, text, toks,
         |          CAST(len(bigrams) AS BIGINT) AS n_bigrams,
         |          CAST(coalesce(list_max(list_transform(list_distinct(bigrams),
         |            x -> len(list_filter(bigrams, y -> y = x)))), 0) AS BIGINT) AS mbc
         |        FROM fnb),
         |fnl AS (SELECT doc_id, text,
         |          ${langIdSql("text")} IN ($langList) AS lang_ok,
         |          $qSum >= 2 AS q_ok,
         |          (CASE WHEN n_bigrams > 0
         |             THEN round(CAST(mbc AS DOUBLE) / n_bigrams, 4) ELSE 0.0 END) <= 0.5 AS rep_ok,
         |          md5(text) AS fp,
         |          CAST(${tokenCountSql("text")} AS BIGINT) AS n_toks
         |        FROM fnr),
         |fs3 AS (SELECT * FROM fnl WHERE lang_ok AND q_ok AND rep_ok),
         |fk4 AS (SELECT fp, min(doc_id) AS keep_id FROM fs3 GROUP BY fp),
         |fed AS (SELECT fs3.doc_id FROM fs3 JOIN fk4 USING (fp) WHERE doc_id <> keep_id),
         |fs4 AS (SELECT fs3.* FROM fs3 JOIN fk4 USING (fp) WHERE doc_id = keep_id),
         |fpp AS (SELECT doc_id,
         |          md5(array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[1:5], ' ')) AS prefix_md5
         |        FROM fs4),
         |fpg AS (SELECT prefix_md5, min(doc_id) AS kept_doc FROM fpp
         |        GROUP BY prefix_md5 HAVING count(*) > 1),
         |fpd AS (SELECT fpp.doc_id FROM fpp JOIN fpg USING (prefix_md5)
         |        WHERE doc_id <> kept_doc),
         |flab AS (SELECT CASE
         |            WHEN NOT lang_ok THEN 'lang'
         |            WHEN NOT q_ok THEN 'quality'
         |            WHEN NOT rep_ok THEN 'repetition'
         |            WHEN doc_id IN (SELECT doc_id FROM fed) THEN 'exact_dup'
         |            WHEN doc_id IN (SELECT doc_id FROM fpd) THEN 'prefix_dup'
         |            ELSE 'kept' END AS stage, n_toks
         |          FROM fnl),
         |fst(stage, stage_rank) AS (VALUES ('lang', 1), ('quality', 2),
         |  ('repetition', 3), ('exact_dup', 4), ('prefix_dup', 5),
         |  ('near_dup', 6), ('kept', 7)),
         |fagg AS (SELECT stage, count(*) AS n_docs, sum(n_toks) AS n_tokens
         |         FROM flab GROUP BY stage)
         |SELECT CAST(fst.stage_rank AS BIGINT) AS stage_rank, fst.stage,
         |  CAST(coalesce(fagg.n_docs, 0) AS BIGINT) AS n_docs,
         |  CAST(coalesce(fagg.n_tokens, 0) AS BIGINT) AS n_tokens
         |FROM fst LEFT JOIN fagg USING (stage)
         |ORDER BY stage_rank""".stripMargin
    },

    "q_script_mix" -> {
      val cls = graft.plans.ScriptMixOps.scriptCaseSql("u.ch")
      val sums = Seq(1 -> "n_latin", 2 -> "n_cjk", 3 -> "n_cyrillic",
        4 -> "n_arabic", 5 -> "n_devanagari", 6 -> "n_hangul",
        7 -> "n_digit", 8 -> "n_space", 9 -> "n_other")
        .map { case (i, name) =>
          s"CAST(coalesce(sum(CASE WHEN cls = $i THEN 1 END), 0) AS BIGINT) AS $name"
        }.mkString(",\n  ")
      s"""WITH smc AS (
         |  SELECT d.doc_id, ($cls) AS cls
         |  FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents) d,
         |    unnest(cs) AS u(ch)),
         |sma AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total,
         |  $sums
         |  FROM smc GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.n_total, 0) AS BIGINT) AS n_total,
         |  coalesce(a.n_latin, 0) AS n_latin, coalesce(a.n_cjk, 0) AS n_cjk,
         |  coalesce(a.n_cyrillic, 0) AS n_cyrillic, coalesce(a.n_arabic, 0) AS n_arabic,
         |  coalesce(a.n_devanagari, 0) AS n_devanagari, coalesce(a.n_hangul, 0) AS n_hangul,
         |  coalesce(a.n_digit, 0) AS n_digit, coalesce(a.n_space, 0) AS n_space,
         |  coalesce(a.n_other, 0) AS n_other
         |FROM documents d LEFT JOIN sma a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    }
  )
}
