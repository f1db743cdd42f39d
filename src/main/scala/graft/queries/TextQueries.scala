package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Chunking, CorpusDiff, Dedup, DupClusters, Packing, Sampling, TextAnalysis}

/** Text-pipeline capability queries (SURVEY.md §2.C) over the
  * documents table.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  /** Split spec shared by the q_split_assign query and its oracle. */
  private val trainValTest = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)

  /** documents ∪ planted near-duplicates (same text + a marker token,
    * id + 1,000,000) — gives the near-dup detectors a deterministic
    * ground truth to surface.
    */
  private[graft] def docsWithPlantedDups(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val dups = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    d.select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .union(dups)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1: exact dedup — min-id survivor per distinct content.
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exact(docs(s, dir), col("doc_id"), col("text"))
        .orderBy(col("keep_id"))
    },

    // C2: MinHash+LSH near-dup pairs over planted duplicates — the
    // oracle-portable hash family (md5 base + affine maps), so DuckDB
    // hash-matches the whole signature→band→verify pipeline. The
    // xxhash64 production path (Dedup.minHashLsh) is spec-covered.
    "q_dedup_minhash" -> { (s, dir) =>
      Dedup.minHashLshMd5(docsWithPlantedDups(s, dir), col("doc_id"), col("text"),
          shingleK = 3, numHashes = 16, bands = 4, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // C3: SimHash near-dup pairs over planted duplicates — the
    // 60-bit md5 portable signature (Dedup.simHashMd5); the native
    // kernel path (Dedup.simHash) is spec-covered.
    "q_dedup_simhash" -> { (s, dir) =>
      Dedup.simHashMd5(docsWithPlantedDups(s, dir), col("doc_id"), col("text"), maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    },

    // C4: exact n-gram Jaccard within planted-dup candidate blocks.
    "q_dedup_ngram" -> { (s, dir) =>
      // prefix blocking (md5 of the first 5 tokens): the planted dup
      // appends to the END of the body so it shares its original's
      // block. An id-modulus block key is NOT scale-stable — on
      // replica-derived corpora (offsets ≡ 0 mod 1e6) every replica
      // collapsed into one block and the pair join went quadratic
      // (the sf10 OOM); a content-prefix key keeps blocks O(dup
      // group) at every SF.
      Dedup.ngramJaccard(docsWithPlantedDups(s, dir), col("doc_id"), col("text"),
          blockBy = prefixBlock(col("text")), shingleK = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // C8: heuristic language ID (stopword argmax CASE cascade).
    "q_lang_id" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    },

    // C9: quality flags (integer arithmetic only).
    "q_text_quality" -> { (s, dir) =>
      val d = docs(s, dir)
      val (lenOk, tokOk, punctOk) = TextAnalysis.qualityFlags(col("text"))
      d.select(col("doc_id"),
          lenOk.as("len_ok"), tokOk.as("tok_ok"), punctOk.as("punct_ok"),
          (lenOk + tokOk + punctOk).as("quality_score"))
        .orderBy(col("doc_id"))
    },

    // C10: token counting — whitespace + BPE-ish regex.
    "q_token_count" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"),
          length(col("text")).cast("bigint").as("n_chars_exact"))
        .orderBy(col("doc_id"))
    },

    // C11: content fingerprint (md5; the shingle fingerprint is
    // spec-verified — not DuckDB-expressible).
    "q_fingerprint" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"))
        .orderBy(col("doc_id"))
    },

    // C14: scrub pipeline (URL/email/tags/whitespace) — exact string
    // oracle via md5 of the scrubbed text.
    "q_scrub" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          md5(graft.ops.TextCleaner.scrubAll(col("text"))).as("scrubbed_md5"),
          length(graft.ops.TextCleaner.scrubAll(col("text"))).cast("bigint").as("scrubbed_len"))
        .orderBy(col("doc_id"))
    },

    // C19: deterministic hash sampling — reproducible corpus
    // subsetting, a pushdown filter with no shuffle.
    "q_sample_hash" -> { (s, dir) =>
      Sampling.hashSample(docs(s, dir), col("doc_id"), 0.1)
        .select(col("doc_id")).orderBy(col("doc_id"))
    },

    // C19b: stratified sample — exactly n per group, hash-ordered.
    "q_sample_stratified" -> { (s, dir) =>
      Sampling.stratifiedSample(docs(s, dir), col("lang"), col("doc_id"), nPerGroup = 5)
        .select(col("lang"), col("doc_id")).orderBy(col("lang"), col("doc_id"))
    },

    // C19c: named train/valid/test split — disjoint, exhaustive, and
    // growth-stable (new rows never move old rows between splits).
    "q_split_assign" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          Sampling.assignSplit(col("doc_id"), trainValTest).as("split"))
        .orderBy(col("doc_id"))
    },

    // C35: sliding-window chunking — RAG/context-window preparation,
    // zero-shuffle narrow map.
    "q_chunk" -> { (s, dir) =>
      Chunking.chunk(docs(s, dir), col("doc_id"), col("text"), size = 64, overlap = 16)
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // C20: sequence packing — concat-then-chunk token stream per
    // source shard, windowed prefix sum.
    "q_pack" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Packing.packChunks(d, col("source"), col("doc_id"), col("n_tokens"), maxTokens = 4096)
        .select(col("doc_id"), col("source"), col("start_offset"), col("chunk_id"))
        .orderBy(col("doc_id"))
    },

    // C21: duplicate clusters — connected components over the n-gram
    // near-dup pair graph (label propagation to a fixed point).
    "q_dup_clusters" -> { (s, dir) =>
      // prefix blocking (see q_dedup_ngram): id-modulus keys go
      // quadratic on replica-derived corpora.
      val pairs = Dedup.ngramJaccard(docsWithPlantedDups(s, dir), col("doc_id"), col("text"),
          blockBy = prefixBlock(col("text")), shingleK = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      DupClusters.connectedComponents(pairs).orderBy(col("doc_id"))
    },

    // C17 oracle: HLL sketch REGISTERS built by the aggregate over
    // the portable md5 hash — integer-exact cross-engine proof of
    // the sketch construction (the estimator is spec-covered).
    "q_hll_registers" -> { (s, dir) =>
      val sk = docs(s, dir).agg(
        graft.plans.HllSketch.hllSketchPreHashed(Dedup.md5Hash60(col("text"))).as("sk"))
      sk.select(posexplode(expr(
          "transform(sequence(0, 4095), i -> cast(conv(substring(hex(sk), i*2+1, 2), 16, 10) as bigint))")))
        .select(col("pos").cast("bigint").as("idx"), col("col").as("register"))
        .orderBy(col("idx"))
    },

    // C22 oracle: theta sketch k-minimum VALUES over the portable
    // hash — DuckDB rebuilds the identical set (distinct + order +
    // limit), integer-exact.
    "q_theta_values" -> { (s, dir) =>
      val sk = docs(s, dir).agg(
        graft.plans.ThetaSketch.thetaSketchPreHashed(Dedup.md5Hash60(col("text"))).as("sk"))
      sk.select(explode(expr(
          "transform(sequence(0, cast((length(sk) - 8) / 8 as int) - 1), " +
          "i -> cast(conv(substring(hex(sk), 17 + i*16, 16), 16, 10) as bigint))")).as("hv"))
        .orderBy(col("hv"))
    },

    // C26: per-doc top terms with document frequency — integer-only
    // keyword statistics.
    "q_term_stats" -> { (s, dir) =>
      TextAnalysis.topTermsPerDoc(docs(s, dir), col("doc_id"), col("text"), topN = 3)
        .orderBy(col("doc_id"), col("rk"))
    },

    // C26b: corpus vocabulary by document frequency.
    "q_vocab" -> { (s, dir) =>
      TextAnalysis.vocabulary(docs(s, dir), col("doc_id"), col("text"), topN = 100)
    },

    // C145: per-source lexical diversity — TTR, hapax share, and
    // Simpson's repeat probability in exact integer milli/micro
    // units; the template-text/gibberish concentration gate.
    "q_lexical_diversity" -> { (s, dir) =>
      graft.ops.LexicalDiversity.perGroup(docs(s, dir), col("source"), col("text"))
    },

    // C28: corpus snapshot diff — "new crawl vs old": statuses per
    // doc from md5 fingerprints (the planted-dup corpus plays the
    // new snapshot: originals unchanged-or-changed, dups added).
    "q_corpus_diff" -> { (s, dir) =>
      val oldSnap = docs(s, dir)
      val newSnap = docsWithPlantedDups(s, dir)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edited"))).otherwise(col("text")))
      CorpusDiff.diff(oldSnap, newSnap, col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    },

    // C16: exact interpolated percentiles per group.
    "q_percentiles" -> { (s, dir) =>
      Tables.read(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }
  )

  /** The planted-dup corpus as a DuckDB CTE (must stay in sync with
    * [[docsWithPlantedDups]]).
    */
  private[graft] val allDocsCte =
    """all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text || ' graftdup' AS text
      |  FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  /** Content-prefix blocking key for pair joins: md5 of the first 5
    * lowercased tokens. Scale-stable where id-modulus keys are not —
    * block size tracks actual duplicate-group size at every SF, and
    * the planted dups (suffix-appended) share their original's block.
    */
  private[queries] def prefixBlock(text: Column): Column =
    md5(array_join(slice(split(trim(lower(text)), "\\s+"), 1, 5), " "))

  private[queries] val prefixBlockSql: String => String = t =>
    s"md5(array_to_string((string_split_regex(trim(lower($t)), '\\s+'))[1:5], ' '))"

  /** Word-3-shingle set per doc, DuckDB formulation (proven equal to
    * TextAnalysis.wordShingles by the q_dedup_ngram oracle).
    */
  private[queries] val shinglesCte =
    """tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM all_docs),
      |sh AS (SELECT doc_id,
      |         list_distinct(CASE WHEN len(toks) >= 3
      |           THEN list_transform(range(1, len(toks) - 1),
      |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |           ELSE [array_to_string(toks, ' ')] END) AS shingles
      |       FROM tok)""".stripMargin

  /** DuckDB twin of the portable MinHash signature: 16 list_min's
    * over the affine family (a_i·base + b_i) mod 2^31-1, base = first
    * 60 bits of md5(shingle) — identical longs to Dedup.minHashLshMd5.
    */
  private val minhashSigList: String = (0 until 16).map { i =>
    s"list_min(list_transform(hs, h -> (${graft.plans.MinHashOps.affineA(i)} * h + ${graft.plans.MinHashOps.affineB(i)}) % ${graft.plans.MinHashOps.P}))"
  }.mkString("[", ",\n           ", "]")

  private def minhashBandSelect(b: Int): String = {
    val elems = (1 to 4).map(j => s"sig[${b * 4 + j}]").mkString(", ")
    s"SELECT doc_id, $b AS band, md5(concat_ws(',', $elems)) AS band_key FROM mh"
  }

  /** DuckDB twin of the portable 60-bit SimHash signature: per bit i,
    * the bit is set when strictly more tokens have md5-bit i set than
    * unset (same threshold as the +1/-1 vote sum being > 0).
    */
  private val simhashSigSum: String = (0 until 60).map { i =>
    s"CASE WHEN 2 * len(list_filter(hashes, h -> (h >> $i) & 1 = 1)) > len(hashes) THEN (CAST(1 AS BIGINT) << $i) ELSE 0 END"
  }.mkString("(", "\n         + ", ")")

  private def simhashChunkSelect(c: Int): String =
    s"SELECT doc_id, simhash, $c AS chunk, (simhash >> ${c * 15}) & 32767 AS chunk_val FROM sig"

  private val hash60Sql: String => String =
    v => s"('0x' || substr(md5(CAST($v AS VARCHAR)), 1, 15))::BIGINT"

  /** HLL register rank of the 48 post-index bits of the 60-bit hash:
    * trailing-zero count + 1, 53 (= 64-p+1, matching
    * HllSketch.updateRegisters) when all remaining bits are zero.
    */
  private val hllRankCase: String = {
    val terms = (1 to 48).map(i => s"WHEN ((hv >> 12) >> ${i - 1}) & 1 = 1 THEN $i")
      .mkString("\n           ")
    s"CASE WHEN (hv >> 12) = 0 THEN 53\n           $terms\n           ELSE 53 END"
  }

  val oracles: Map[String, String] = Map(
    "q_hll_registers" ->
      s"""WITH h AS (SELECT ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv FROM documents),
         |regs AS (SELECT CAST(hv & 4095 AS BIGINT) AS idx,
         |         MAX($hllRankCase) AS register
         |         FROM h GROUP BY 1)
         |SELECT r.range AS idx, CAST(COALESCE(regs.register, 0) AS BIGINT) AS register
         |FROM range(4096) r LEFT JOIN regs ON r.range = regs.idx
         |ORDER BY idx""".stripMargin,

    "q_theta_values" ->
      """WITH h AS (SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
        |           FROM documents)
        |SELECT hv FROM h ORDER BY hv LIMIT 1024""".stripMargin,

    "q_corpus_diff" ->
      s"""WITH $allDocsCte,
         |new_snap AS (SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' edited' ELSE text END AS text
         |  FROM all_docs),
         |a AS (SELECT doc_id, md5(text) AS old_md5 FROM documents),
         |b AS (SELECT doc_id, md5(text) AS new_md5 FROM new_snap)
         |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         |  CASE WHEN a.old_md5 IS NULL THEN 'added'
         |       WHEN b.new_md5 IS NULL THEN 'removed'
         |       WHEN a.old_md5 = b.new_md5 THEN 'unchanged'
         |       ELSE 'changed' END AS status,
         |  a.old_md5, b.new_md5
         |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
         |ORDER BY doc_id""".stripMargin,

    "q_term_stats" ->
      """WITH tf AS (
        |  SELECT doc_id, t.term, count(*) AS tf
        |  FROM documents, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t(term)
        |  GROUP BY doc_id, t.term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |ranked AS (SELECT doc_id, term, tf,
        |             row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rk
        |           FROM tf)
        |SELECT r.doc_id, r.term, r.tf, d.df, CAST(r.rk AS BIGINT) AS rk
        |FROM ranked r JOIN dfreq d ON r.term = d.term
        |WHERE r.rk <= 3 ORDER BY r.doc_id, r.rk""".stripMargin,

    "q_lexical_diversity" ->
      s"""WITH ${graft.ops.LexicalDiversity.perGroupSql("documents", "source")}
         |SELECT source, n_tokens, n_types, n_hapax, ttr_milli, simpson_micro
         |FROM ldout ORDER BY source""".stripMargin,

    "q_vocab" ->
      """WITH tf AS (
        |  SELECT doc_id, t.term, count(*) AS tf
        |  FROM documents, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t(term)
        |  GROUP BY doc_id, t.term)
        |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
        |FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 100""".stripMargin,

    "q_sample_hash" ->
      s"""SELECT doc_id FROM documents
         |WHERE ${hash60Sql("doc_id")} < ${(BigDecimal(0.1) * BigDecimal(Sampling.HashSpace)).toLong}
         |ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      s"""WITH r AS (SELECT lang, doc_id,
         |  row_number() OVER (PARTITION BY lang ORDER BY ${hash60Sql("doc_id")}, doc_id) AS rk
         |  FROM documents)
         |SELECT lang, doc_id FROM r WHERE rk <= 5 ORDER BY lang, doc_id""".stripMargin,

    "q_split_assign" ->
      s"""SELECT doc_id, ${Sampling.assignSplitSql("doc_id", trainValTest)} AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_chunk" ->
      (Chunking.chunkSql("documents", "doc_id", "text", size = 64, overlap = 16) +
        "\nORDER BY doc_id, chunk_id"),

    "q_pack" ->
      s"""WITH d AS (SELECT doc_id, source, ${TextAnalysis.tokenCountSql("text")} AS n_tokens
         |           FROM documents),
         |p AS (SELECT doc_id, source,
         |        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |      FROM d)
         |SELECT doc_id, source, start_offset,
         |  CAST(FLOOR(start_offset / 4096.0) AS BIGINT) AS chunk_id
         |FROM p ORDER BY doc_id""".stripMargin,

    "q_dup_clusters" ->
      s"""WITH RECURSIVE $allDocsCte,
         |$shinglesCte,
         |blk AS (SELECT doc_id, ${prefixBlockSql("text")} AS block FROM all_docs),
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
         |  SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src)
         |SELECT id AS doc_id, min(r) AS cluster_id FROM reach
         |GROUP BY id ORDER BY doc_id""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH $allDocsCte,
         |$shinglesCte,
         |bh AS (SELECT doc_id, shingles,
         |         list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS hs
         |       FROM sh),
         |mh AS (SELECT doc_id, shingles,
         |         $minhashSigList AS sig
         |       FROM bh),
         |banded AS (
         |  ${(0 until 4).map(minhashBandSelect).mkString("\n  UNION ALL ")}),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM banded x JOIN banded y
         |           ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
         |j AS (SELECT c.id_a, c.id_b,
         |        CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         |          / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jac
         |      FROM cand c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id)
         |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM j
         |WHERE jac >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH $allDocsCte,
         |hs AS (SELECT doc_id,
         |         list_transform(string_split_regex(trim(lower(text)), '\\s+'),
         |           t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hashes
         |       FROM all_docs),
         |sig AS (SELECT doc_id,
         |        $simhashSigSum AS simhash
         |        FROM hs),
         |chunks AS (
         |  ${(0 until 4).map(simhashChunkSelect).mkString("\n  UNION ALL ")}),
         |pairs AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
         |            CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |          FROM chunks x JOIN chunks y
         |            ON x.chunk = y.chunk AND x.chunk_val = y.chunk_val AND x.doc_id < y.doc_id)
         |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text), length(text) ORDER BY keep_id""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text || ' graftdup' AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |tok AS (SELECT doc_id, ${prefixBlockSql("text")} AS block,
        |               string_split_regex(trim(lower(text)), '\\s+') AS toks FROM all_docs),
        |sh AS (SELECT doc_id, block,
        |         list_distinct(CASE WHEN len(toks) >= 3
        |           THEN list_transform(range(1, len(toks) - 1),
        |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |           ELSE [array_to_string(toks, ' ')] END) AS shingles
        |       FROM tok)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q_lang_id" ->
      s"""SELECT doc_id, ${TextAnalysis.langIdSql("text")} AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      s"""SELECT doc_id,
         | CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1 ELSE 0 END AS len_ok,
         | CASE WHEN ${TextAnalysis.tokenCountSql("text")} >= 20 THEN 1 ELSE 0 END AS tok_ok,
         | CASE WHEN (${TextAnalysis.punctCountSql("text")}) * 10 <= length(text) THEN 1 ELSE 0 END AS punct_ok,
         | (CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1 ELSE 0 END
         |  + CASE WHEN ${TextAnalysis.tokenCountSql("text")} >= 20 THEN 1 ELSE 0 END
         |  + CASE WHEN (${TextAnalysis.punctCountSql("text")}) * 10 <= length(text) THEN 1 ELSE 0 END) AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      s"""SELECT doc_id,
         | ${TextAnalysis.tokenCountSql("text")} AS n_tokens,
         | ${TextAnalysis.bpeTokenCountSql("text")} AS n_bpe_tokens,
         | length(text) AS n_chars_exact
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5 FROM documents ORDER BY doc_id""".stripMargin,

    "q_scrub" ->
      s"""SELECT doc_id, md5(${graft.ops.TextCleaner.scrubAllSql("text")}) AS scrubbed_md5,
         | length(${graft.ops.TextCleaner.scrubAllSql("text")}) AS scrubbed_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_percentiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.9), 6) AS p90,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
