package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Boilerplate, BpePairs, CdcApply, Cooccurrence, CorpusStats, DupSpans, EquiDepth, IncrementalAgg, Mixing, NgramLm, Packing, PageRank, Profiler, QualityClassifier, RateLimit, RetrievalEval, Sampling, TextAnalysis}

/** Round-5 capability queries: substring-level duplication (dup
  * spans, boilerplate lines), n-gram LM scoring, temperature source
  * mixing, length-bucketed batching, grouping sets, and JSON
  * property extraction. Oracle rules per SURVEY §4.
  */
object CorpusQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  private val hash60: String => String =
    v => s"('0x' || substr(md5(CAST($v AS VARCHAR)), 1, 15))::BIGINT"

  val SpanK = 5
  val LineTokens = 10
  val LineMaxDocFreq = 2
  val MixBudget = 200
  val BatchBucketWidth = 32
  val BatchMaxTokens = 512

  /** 10-token lines rejoined with newlines — the derived multi-line
    * text both engines feed to the boilerplate pass (the synthetic
    * documents are single-line, so lines are materialized from fixed
    * token windows).
    */
  private def linedText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // TokenLinesExpr kernel — equality with the HOF
    // transform(slice/array_join) composition is pinned in
    // TokenLinesExprSpec; the interpreted form was 11 of
    // q_boilerplate's 11.2 s at sf10 (the operator itself is 0.4 s)
    graft.plans.TokenLinesExpr.tokenLines(text, LineTokens, "\n")

  private val linedTextSql: String =
    s"""array_to_string(list_transform(
       |      range(0, CAST(ceil(len(toks) / ${LineTokens.toDouble}) AS BIGINT)),
       |      g -> array_to_string(list_slice(toks, g * $LineTokens + 1, g * $LineTokens + $LineTokens), ' ')),
       |    chr(10))""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C35: duplicate k-token spans across documents.
    "q_dup_spans" -> { (s, dir) =>
      DupSpans.duplicatedSpans(t(s, dir, "documents"), col("doc_id"), col("text"), SpanK)
        .orderBy(col("doc_id"))
    },

    // C36: line-level boilerplate removal over the 10-token lines.
    "q_boilerplate" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), linedText(col("text")).as("text"))
      Boilerplate.removeCommonLines(docs, col("doc_id"), col("text"), LineMaxDocFreq)
        .orderBy(col("doc_id"))
    },

    // C37: interpolated bigram LM scoring (the perplexity filter).
    "q_lm_score" -> { (s, dir) =>
      NgramLm.bigramScore(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    },

    // C142: Moore-Lewis cross-entropy difference selection — seed =
    // the English slice; keep docs the seed LM likes more than the
    // corpus LM (integer micro-nat sums decide, never a rounded
    // double).
    "q_moore_lewis" -> { (s, dir) =>
      graft.ops.MooreLewis.score(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("lang") === "en")
        .orderBy(col("doc_id"))
    },

    // C38: temperature-weighted (alpha=0.5) language mixing.
    "q_temperature_mix" -> { (s, dir) =>
      Sampling.temperatureSample(t(s, dir, "documents"), col("lang"), col("doc_id"), MixBudget)
        .select(col("lang"), col("doc_id"), col("mix_rank"))
        .orderBy(col("lang"), col("mix_rank"))
    },

    // C39: length-bucketed batch assembly under a padded-token budget.
    "q_length_batch" -> { (s, dir) =>
      val base = t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Packing.lengthBatches(base, col("doc_id"), col("n_tokens"),
          BatchBucketWidth, BatchMaxTokens)
        .orderBy(col("doc_id"))
    },

    // A38: explicit GROUPING SETS lattice (partial cube — only the
    // requested subtotal combinations, unlike cube/rollup).
    "q_grouping_sets" -> { (s, dir) =>
      Tables.registerViews(s, dir)
      s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
              |       coalesce(l_linestatus, 'ALL') AS ls,
              |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
              |       count(*) AS n,
              |       sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
              |       min(l_extendedprice) AS min_price,
              |       max(l_extendedprice) AS max_price
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
              |ORDER BY gid, rf, ls""".stripMargin)
    },

    // C51: span-level dedup REWRITE — tokens covered by cross-doc
    // duplicated 5-token spans removed, docs reassembled.
    "q_dup_span_removal" -> { (s, dir) =>
      DupSpans.removeDuplicatedSpans(t(s, dir, "documents"), col("doc_id"), col("text"), SpanK)
        .orderBy(col("doc_id"))
    },

    // C41: hashed linear quality classifier (fastText-style gate).
    "q_quality_score" -> { (s, dir) =>
      QualityClassifier.score(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    },

    // C42: per-source unigram entropy + KL drift vs the corpus.
    "q_source_drift" -> { (s, dir) =>
      CorpusStats.sourceDrift(t(s, dir, "documents"), col("source"), col("text"))
        .orderBy(col("source"))
    },

    // C128: pairwise source-overlap matrix — exact shingle Jaccard +
    // the mergeable per-source MinHash estimate side by side, for
    // every source pair. Hash-keyed self-join, text never shuffles.
    "q_source_overlap" -> { (s, dir) =>
      graft.ops.SourceOverlap.matrix(t(s, dir, "documents"),
        col("text"), col("source"), shingleK = 3, numHashes = 16)
    },

    // C135: per-source conditional bigram entropy — the
    // predictability gauge that catches rigid-order boilerplate
    // unigram entropy misses. Two kernel-gram partial-agg passes.
    "q_cond_entropy" -> { (s, dir) =>
      graft.ops.NgramStats.conditionalEntropy(t(s, dir, "documents"),
          col("source"), col("text"))
        .orderBy(col("source"))
    },

    // C131: corpus n-gram fingerprint — top-25 trigrams with
    // multiplicity + corpus share (boilerplate/template radar).
    // Grams stay in-row until ONE explode; top-k is TakeOrdered.
    "q_top_ngrams" -> { (s, dir) =>
      graft.ops.NgramStats.topNgrams(t(s, dir, "documents"), col("text"),
        n = 3, k = 25)
    },

    // C44: integer PageRank over the customer<->supplier trade graph
    // (the link-centrality quality prior), 3 fixed iterations.
    "q_pagerank" -> { (s, dir) =>
      val orders = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = orders.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
        .unionAll(pairs.select(col("p").as("src"), col("c").as("dst")))
      PageRank.ranks(edges, iters = 3).orderBy(col("node"))
    },

    // C45: BPE merge-candidate scoring (top adjacent char pairs).
    "q_bpe_pairs" -> { (s, dir) =>
      BpePairs.topPairs(t(s, dir, "documents"), col("text"), k = 40)
        .orderBy(col("n_total").desc, col("pair"))
    },

    // A40: equi-depth histogram over the distinct-value histogram.
    "q_equidepth" -> { (s, dir) =>
      EquiDepth.histogram(t(s, dir, "lineitem"), floor(col("l_extendedprice")), buckets = 16)
        .orderBy(col("bucket"))
    },

    // C46: long-format column profile (ingest data-quality audit).
    "q_profile" -> { (s, dir) =>
      Profiler.profile(t(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy(col("column"))
    },

    // C47: retrieval eval metrics (recall@k / MRR / nDCG@k) over a
    // deterministic pseudo-retrieval: each label queries a hash-
    // ranked candidate pool (vec_id ≡ label mod 7); qrels are the
    // same-label vectors.
    "q_retrieval_eval" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").cast("bigint").as("doc_id"),
          col("label").cast("bigint").as("label"))
      val labels = emb.select(col("label").as("query_id")).distinct()
      val pool = labels.join(emb, pmod(col("doc_id"), lit(7L)) === pmod(col("query_id"), lit(7L)))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(graft.ops.Dedup.md5Hash60(
          concat(col("query_id").cast("string"), lit(":"), col("doc_id").cast("string"))),
          col("doc_id"))
      val rankings = pool
        .select(col("query_id"), col("doc_id"), row_number().over(w).cast("bigint").as("rank"))
        .filter(col("rank") <= 10)
      val qrels = emb.select(col("label").as("query_id"), col("doc_id"))
      RetrievalEval.metrics(rankings, qrels, k = 10).orderBy(col("query_id"))
    },

    // C48: incremental aggregate maintenance — two "daily" halves
    // aggregated separately then merged; the oracle is the one-shot
    // groupBy of the full table (merge(agg(A),agg(B)) == agg(A∪B)).
    "q_incremental_agg" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      def half(m: Int) = IncrementalAgg.aggregate(
        li.filter(pmod(col("l_orderkey"), lit(2)) === m),
        col("l_returnflag"), floor(col("l_quantity")), col("l_partkey"))
      IncrementalAgg.merge(half(0), half(1))
        .select(col("group").as("grp"), col("n"), col("sum_v"), col("min_v"), col("max_v"))
        .orderBy(col("grp"))
    },

    // C49: co-occurrence PMI pairs (collocation mining, window 2).
    "q_pmi" -> { (s, dir) =>
      Cooccurrence.pmiPairs(t(s, dir, "documents"), col("text"), window = 2, k = 50)
        .orderBy(col("n_pair").desc, col("w1"), col("w2"))
    },

    // A41: CDC merge-apply — an ordered I/U/D change log derived from
    // the customer table applied to it in one pass; the oracle derives
    // the expected final state independently.
    "q_cdc_apply" -> { (s, dir) =>
      val cust = t(s, dir, "customer").select(col("c_custkey").cast("bigint").as("k"),
        col("c_name").as("name"), col("c_nationkey").cast("bigint").as("nat"))
      val updates = cust.filter(pmod(col("k"), lit(7L)) === 0)
        .select(col("k"), lit(1L).as("version"), lit("U").as("op"),
          concat(lit("upd_"), col("k")).as("name"), col("nat"))
      val deletes = cust.filter(pmod(col("k"), lit(10L)) === 0)
        .select(col("k"), lit(2L).as("version"), lit("D").as("op"),
          lit(null).cast("string").as("name"), lit(null).cast("bigint").as("nat"))
      val inserts = cust.filter(pmod(col("k"), lit(13L)) === 0)
        .select((col("k") + lit(1000000L)).as("k"), lit(1L).as("version"), lit("U").as("op"),
          concat(lit("new_"), col("k")).as("name"), col("nat"))
      CdcApply.apply(cust, updates.unionByName(deletes).unionByName(inserts),
          "k", "version", "op", Seq("name", "nat"))
        .orderBy(col("k"))
    },

    // A42: per-key windowed rate limiting (first 3 events per user
    // per hour, deterministic tiebreak).
    "q_rate_limit" -> { (s, dir) =>
      RateLimit.keepFirstNPerHour(
          t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts")),
          col("user_id"), col("ts"), col("event_id"), n = 3)
        .select(col("event_id"), col("user_id"), col("hour_us"), col("seq"))
        .orderBy(col("event_id"))
    },

    // C50: deterministic weighted source interleaving (the global
    // training order of the mixture).
    "q_interleave" -> { (s, dir) =>
      val weights = (0 until 20).map(i => s"src$i" -> (1 + (i % 4) * 2)).toMap
      Mixing.interleave(t(s, dir, "documents"), col("source"), col("doc_id"), weights)
        .orderBy(col("vkey"), col("source"), col("src_rank"))
    },

    // A43: per-group correlation + least-squares fit, computed from
    // integer-exact moment sums so the final doubles derive
    // identically in any engine: corr, slope, intercept per
    // returnflag. The n·Σyy / (Σy)² numerators grow QUADRATICALLY
    // with group size — they overflow int64 past ~10M rows/group
    // (hit at the derived sf10), so the whole moment path runs in
    // DECIMAL(38,0): exact to 1e38 (room for ~1e12-row groups at
    // 100 TB), the same promotion DuckDB's HUGEINT sum() gives its
    // twin. The numerator OUTPUT columns are emitted as STRING:
    // decimal internally (a bigint would be an intrinsic scale cap),
    // but a decimal OUTPUT column hashes differently across engines
    // (Spark Decimal vs DuckDB DECIMAL rendering), while the decimal
    // digits of a scale-0 value are one canonical string everywhere.
    "q_corr_regress" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("grp"),
        floor(col("l_quantity")).cast("bigint").as("x"),
        floor(col("l_extendedprice") / 100).cast("bigint").as("y"))
      val m = li.groupBy(col("grp")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      // 19 digits holds any int64; the 19x19 product caps at
      // decimal(38,0) and the largest possible value (9.2e18)^2 =
      // 8.5e37 still fits, so the arithmetic is exact for ANY inputs
      val dec = "decimal(19,0)"
      def prodDiff(a: Column, b: Column, c: Column, d: Column): Column =
        (a.cast(dec) * b.cast(dec) - c.cast(dec) * d.cast(dec)).cast("decimal(38,0)")
      m.select(col("grp"), col("n"),
          prodDiff(col("n"), col("sxy"), col("sx"), col("sy")).as("cov_num"),
          prodDiff(col("n"), col("sxx"), col("sx"), col("sx")).as("var_x_num"),
          prodDiff(col("n"), col("syy"), col("sy"), col("sy")).as("var_y_num"),
          col("sx"), col("sy"))
        .select(col("grp"), col("n"),
          col("cov_num").cast("string").as("cov_num"),
          col("var_x_num").cast("string").as("var_x_num"),
          col("var_y_num").cast("string").as("var_y_num"),
          round(col("cov_num").cast("double") /
            sqrt(col("var_x_num").cast("double") * col("var_y_num").cast("double")), 4)
            .as("corr"),
          round(col("cov_num").cast("double") / col("var_x_num").cast("double"), 4)
            .as("slope"),
          round((col("sy").cast("double") -
              col("cov_num").cast("double") / col("var_x_num").cast("double")
                * col("sx").cast("double"))
            / col("n").cast("double"), 4).as("intercept"))
        .orderBy(col("grp"))
    },

    // A44: per-group mode (argmax by count with deterministic
    // smallest-value tie-break — `mode()` builtins tie arbitrarily,
    // this composition is engine-portable): two partial-agg shuffles,
    // the second over |group × distinct value| count rows only.
    "q_mode" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val counts = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("grp"),
          floor(col("l_quantity")).cast("bigint").as("v"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("grp")).orderBy(col("c").desc, col("v"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("grp"), col("v").as("mode_val"), col("c").as("mode_count"))
        .orderBy(col("grp"))
    },

    // A39: JSON property extraction from the events props column,
    // aggregated per event type — integer-exact outputs.
    "q_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q_dup_spans" ->
      s"""WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
         |             FROM documents),
         |sp AS (SELECT doc_id,
         |         list_distinct(CASE WHEN len(toks) >= $SpanK
         |           THEN list_transform(range(1, len(toks) - ${SpanK - 2}),
         |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
         |           ELSE [array_to_string(toks, ' ')] END) AS spans
         |       FROM tok),
         |ex AS (SELECT doc_id, ${hash60("u.s")} AS shash FROM sp, unnest(sp.spans) AS u(s)),
         |dup AS (SELECT shash FROM ex GROUP BY shash HAVING count(*) >= 2),
         |hits AS (SELECT doc_id, count(*) AS n_dup FROM ex JOIN dup USING (shash) GROUP BY doc_id)
         |SELECT sp.doc_id, CAST(len(spans) AS BIGINT) AS n_spans,
         |  CAST(coalesce(h.n_dup, 0) AS BIGINT) AS n_dup_spans,
         |  CASE WHEN len(spans) > 0
         |    THEN round(CAST(coalesce(h.n_dup, 0) AS DOUBLE) / len(spans), 4)
         |    ELSE 0.0 END AS dup_span_frac
         |FROM sp LEFT JOIN hits h USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q_boilerplate" ->
      s"""WITH dtoks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
         |               FROM documents),
         |docs_n AS (SELECT doc_id, $linedTextSql AS text FROM dtoks),
         |${Boilerplate.removeCommonLinesSql("docs_n", LineMaxDocFreq)}
         |SELECT doc_id, clean_md5, CAST(n_kept AS BIGINT) AS n_kept,
         |  CAST(n_removed AS BIGINT) AS n_removed
         |FROM cleaned ORDER BY doc_id""".stripMargin,

    "q_lm_score" ->
      s"""WITH ${NgramLm.bigramScoreSql("documents")}
         |SELECT doc_id, n_bigrams, avg_logprob FROM scored ORDER BY doc_id""".stripMargin,

    "q_moore_lewis" ->
      s"""WITH ${graft.ops.MooreLewis.scoreSql("documents", "lang = 'en'")}
         |SELECT doc_id, n_bigrams, ml_score, keep FROM mlsc ORDER BY doc_id""".stripMargin,

    "q_temperature_mix" ->
      s"""WITH ${Sampling.temperatureTargetsSql("documents", "lang", MixBudget)},
         |r AS (SELECT lang, doc_id,
         |        CAST(row_number() OVER (PARTITION BY lang
         |          ORDER BY ${hash60("doc_id")}, doc_id) AS BIGINT) AS mix_rank
         |      FROM documents)
         |SELECT r.lang, r.doc_id, r.mix_rank
         |FROM r JOIN ttargets t ON r.lang = t.g
         |WHERE r.mix_rank <= t.n_target
         |ORDER BY lang, mix_rank""".stripMargin,

    "q_length_batch" ->
      s"""WITH base AS (SELECT doc_id,
         |    CAST(${TextAnalysis.tokenCountSql("text")} AS BIGINT) AS n_tokens
         |  FROM documents),
         |${Packing.lengthBatchesSql("base", BatchBucketWidth, BatchMaxTokens)}
         |SELECT doc_id, n_tokens, bucket, padded_len, batch_id
         |FROM lbatch ORDER BY doc_id""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, rf, ls""".stripMargin,

    "q_dup_span_removal" -> dupSpanRemovalOracle(shards = 1),

    "q_quality_score" ->
      s"""WITH ${QualityClassifier.scoreSql("documents")}
         |SELECT doc_id, n_features, logit_milli, score, keep
         |FROM qscored ORDER BY doc_id""".stripMargin,

    "q_source_drift" ->
      s"""WITH ${CorpusStats.sourceDriftSql("documents")}
         |SELECT source, n_distinct_terms, n_tokens, entropy, kl_vs_corpus
         |FROM drift ORDER BY source""".stripMargin,

    "q_source_overlap" ->
      graft.ops.SourceOverlap.matrixSql(shingleK = 3, numHashes = 16),

    "q_top_ngrams" -> graft.ops.NgramStats.topNgramsSql(n = 3, k = 25),

    "q_cond_entropy" -> graft.ops.NgramStats.conditionalEntropySql(),

    "q_pagerank" -> pagerankOracle(shards = 1),

    "q_bpe_pairs" -> BpePairs.topPairsSql("documents", k = 40),

    "q_equidepth" ->
      s"""WITH ${EquiDepth.histogramSql("lineitem", "floor(l_extendedprice)", buckets = 16)}
         |SELECT bucket, n_rows, n_values, min_val, max_val
         |FROM edepth ORDER BY bucket""".stripMargin,

    "q_profile" ->
      s"""SELECT * FROM (
         |${Profiler.profileSql("documents", Seq("doc_id", "lang", "source", "n_chars"))}
         |) ORDER BY "column"""".stripMargin,

    "q_retrieval_eval" -> {
      val rankSql =
        """SELECT query_id, doc_id, rank FROM (
          |  SELECT l.query_id, e.vec_id AS doc_id,
          |    row_number() OVER (PARTITION BY l.query_id
          |      ORDER BY ('0x' || substr(md5(CAST(l.query_id AS VARCHAR) || ':' || CAST(e.vec_id AS VARCHAR)), 1, 15))::BIGINT,
          |        e.vec_id) AS rank
          |  FROM (SELECT DISTINCT CAST(label AS BIGINT) AS query_id FROM embeddings) l
          |  JOIN embeddings e ON e.vec_id % 7 = l.query_id % 7)
          |WHERE rank <= 10""".stripMargin
      val qrelSql =
        "SELECT CAST(label AS BIGINT) AS query_id, vec_id AS doc_id FROM embeddings"
      s"""WITH ${RetrievalEval.metricsSql(rankSql, qrelSql, k = 10)}
         |SELECT query_id, n_relevant, n_hits, recall_at_k, mrr, ndcg_at_k
         |FROM reval ORDER BY query_id""".stripMargin
    },

    "q_incremental_agg" ->
      """SELECT l_returnflag AS grp, count(*) AS n,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_v,
        |  CAST(min(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS min_v,
        |  CAST(max(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS max_v
        |FROM lineitem GROUP BY l_returnflag ORDER BY grp""".stripMargin,

    "q_pmi" -> Cooccurrence.pmiPairsSql("documents", window = 2, k = 50),

    "q_cdc_apply" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS k,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'upd_' || c_custkey ELSE c_name END AS name,
        |    CAST(c_nationkey AS BIGINT) AS nat
        |  FROM customer WHERE c_custkey % 10 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000 AS k, 'new_' || c_custkey AS name,
        |    CAST(c_nationkey AS BIGINT) AS nat
        |  FROM customer WHERE c_custkey % 13 = 0
        |) ORDER BY k""".stripMargin,

    "q_rate_limit" ->
      """SELECT event_id, user_id, hour_us, seq FROM (
        |  SELECT event_id, user_id,
        |    epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS hour_us,
        |    CAST(row_number() OVER (
        |      PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS BIGINT) AS seq
        |  FROM events)
        |WHERE seq <= 3 ORDER BY event_id""".stripMargin,

    "q_interleave" -> {
      val values = (0 until 20)
        .map(i => s"('src$i', ${1 + (i % 4) * 2})").mkString(", ")
      s"""WITH ${Mixing.interleaveSql("documents", "source", "doc_id",
           s"SELECT * FROM (VALUES $values) AS t(source, w)")}
         |SELECT source, doc_id, src_rank, vkey FROM mixed
         |ORDER BY vkey, source, src_rank""".stripMargin
    },

    "q_corr_regress" ->
      """WITH m AS (
        |  SELECT l_returnflag AS grp, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM (SELECT l_returnflag,
        |          CAST(floor(l_quantity) AS BIGINT) AS x,
        |          CAST(floor(l_extendedprice / 100) AS BIGINT) AS y
        |        FROM lineitem)
        |  GROUP BY 1)
        |SELECT grp, CAST(n AS BIGINT) AS n,
        |  CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS VARCHAR) AS cov_num,
        |  CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS VARCHAR) AS var_x_num,
        |  CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0)) AS VARCHAR) AS var_y_num,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 4) AS corr,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS slope,
        |  round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE), 4) AS intercept
        |FROM m ORDER BY grp""".stripMargin,

    "q_mode" ->
      """SELECT grp, mode_val, mode_count FROM (
        |  SELECT grp, v AS mode_val, c AS mode_count,
        |    row_number() OVER (PARTITION BY grp ORDER BY c DESC, v) AS rn
        |  FROM (SELECT l_returnflag AS grp,
        |          CAST(floor(l_quantity) AS BIGINT) AS v, count(*) AS c
        |        FROM lineitem GROUP BY 1, 2))
        |WHERE rn = 1 ORDER BY grp""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum((props::JSON ->> 'k')::BIGINT) AS BIGINT) AS sum_k,
        |  min((props::JSON ->> 'k')::BIGINT) AS min_k,
        |  max((props::JSON ->> 'k')::BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )

  /** q_pagerank's twin at an arbitrary twin-side shard count
    * (results are shard-invariant, which the fuzz harness exercises;
    * see PageRank.ranksSql). The committed oracle is shards=1: the
    * sf10 fix was MATERIALIZING the edge/node/rank CTEs (the r8 twin
    * re-inlined the 1.2B-row edge DISTINCT once per iteration, which
    * exhausted the spill disk); sharded branches are correct but
    * DuckDB executes union branches concurrently, so shards>1
    * multiplies peak state instead of bounding it.
    */
  def pagerankOracle(shards: Int): String = {
    val edgeSql =
      """SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |UNION ALL
        |SELECT l_suppkey * 2 + 1 AS src, o_custkey * 2 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin
    s"""WITH ${PageRank.ranksSql(edgeSql, iters = 3, shards = shards)}
       |SELECT node, rank_scaled, rank FROM prank ORDER BY node""".stripMargin
  }

  /** q_dup_span_removal's twin at an arbitrary twin-side shard count
    * (shard-invariant; see DupSpans.removeDuplicatedSpansSql).
    */
  def dupSpanRemovalOracle(shards: Int): String =
    s"""WITH ${DupSpans.removeDuplicatedSpansSql("documents", SpanK, shards = shards)}
       |SELECT doc_id, n_tokens, n_removed, clean_md5
       |FROM sremoved ORDER BY doc_id""".stripMargin
}
