package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Decontaminate, Dedup, DedupEval, DomainCuration, DupClusters, Novelty, ParagraphDedup, QualityClassifier, Retention, Sampling, SemanticDedup}

/** Dedup / decontamination queries beyond the TextQueries core
  * family: prefix dedup (C56), normalized exact dedup (C65), URL
  * canonicalization dedup (C55), semantic cell dedup (C54),
  * containment pairs (C67), one-permutation MinHash LSH (C85),
  * star-contraction cluster closure (C21 scale path), paragraph
  * dedup (C82), quality-aware retention (C88), LSH candidate-recall
  * metrics (C91), document novelty (C64), hard decontamination
  * (C61), semantic decontamination (C80), and span-level
  * contamination localization (C89).
  */
object DedupQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  val PrefixK = 10
  val SemThreshold = 0.2

  /** 64 cells, not 8: within-cell pair work is quadratic in cell
    * size, so the cell count must grow with the corpus (SemDeDup
    * runs ~10k clusters at web scale) — 8 cells measured 67 s at the
    * 10× bench SF where 64 cells hold the query near-linear.
    */
  val SemAnchors: Seq[Seq[Double]] = SemanticDedup.anchors(dim = 64, k = 64)

  /** Containment fixture: tokens per planted sub-document snippet. */
  val SnippetToks = 45

  /** Same anchors/threshold family as q_semantic_dedup (C54). */
  val DeconThreshold = 0.25
  val DeconAnchors: Seq[Seq[Double]] = SemanticDedup.anchors(dim = 64, k = 64)
  /** Eval split: every 20th embedding plays the eval set. */
  val EvalMod = 20L
  /** Paragraph construction: tokens per synthetic paragraph + the
    * planted boilerplate footer every document carries.
    */
  val ParaTokens = 8
  val ParaFooter = "standard footer boilerplate paragraph"
  /** OPH signature: bins, bands, verify threshold (q_dedup_minhash's). */
  val OphBins = 16
  val OphBands = 4
  val OphThreshold = 0.5
  /** Winnowing window (C133): fingerprints guarantee any shared run
    * of >= w+k-1 = 6 tokens. */
  val WinnowW = 4
  /** Span width for contamination localization (q_dup_spans' k). */
  val ContamK = 5
  /** Eval split for span localization: every 20th doc plays eval. */
  val ContamEvalMod = 20L

  /** Deterministically MESSY url for the canonicalization query:
    * case noise, utm params (pure and mixed-with-kept), fragments,
    * trailing slashes — collisions guaranteed by the coarse mod-7
    * host / mod-10 path keys. Identical construction in the twin.
    */
  private def messyUrl: Column =
    concat(
      when(col("doc_id") % 2 === 0, lit("https")).otherwise(lit("HTTPS")),
      lit("://"),
      when(col("doc_id") % 3 === 0, lit("D")).otherwise(lit("d")),
      (col("doc_id") % 7).cast("string"), lit(".Example.com/p"),
      (col("doc_id") % 10).cast("string"),
      when(col("doc_id") % 13 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0, lit("?utm_source=feed&utm_campaign=x"))
        .when(col("doc_id") % 5 === 0, lit("?utm_medium=a&page=2"))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit("#frag")).otherwise(lit("")))

  private val messyUrlSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END || '://' ||
      | CASE WHEN doc_id % 3 = 0 THEN 'D' ELSE 'd' END ||
      | CAST(doc_id % 7 AS VARCHAR) || '.Example.com/p' || CAST(doc_id % 10 AS VARCHAR) ||
      | CASE WHEN doc_id % 13 = 0 THEN '/' ELSE '' END ||
      | CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=x'
      |      WHEN doc_id % 5 = 0 THEN '?utm_medium=a&page=2' ELSE '' END ||
      | CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END)""".stripMargin

  /** Metrics corpus for C91: the q_dedup_* planted near-dups (jaccard
    * ≈ 1, every banding catches them) PLUS half-prefix partial dups
    * (jaccard ≈ 0.48 by containment — inside the truth threshold but
    * far below the bands=2 S-curve midpoint ≈ 0.84), so candidate
    * recall is genuinely partial instead of a trivial 1000.
    */
  private def docsWithMixedDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val near = d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"))
    val toks = split(trim(lower(col("text"))), "\\s+")
    val partial = d.filter(col("doc_id") % 20 === 10)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        array_join(slice(toks, lit(1),
          greatest(floor(size(toks) / 2).cast("int"), lit(5))), " ").as("text"))
    d.union(near).union(partial)
  }

  private val mixedDocsCte: String =
    """mx_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' graftdup'
      |  FROM documents WHERE doc_id % 20 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |    array_to_string(toks[1:greatest(len(toks) // 2, 5)], ' ')
      |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |        FROM documents)
      |  WHERE doc_id % 20 = 10)""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C56: prefix dedup — docs sharing their first 10 tokens.
    "q_prefix_dedup" -> { (s, dir) =>
      Dedup.prefixGroups(t(s, dir, "documents"), col("doc_id"), col("text"), k = PrefixK)
        .orderBy(col("prefix_md5"))
    },

    // C65: normalized exact dedup — canonical text key (lowercase,
    // punctuation strip, whitespace collapse) between C1 and MinHash.
    "q_normalized_dedup" -> { (s, dir) =>
      Dedup.normalizedExact(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("keep_id"))
    },

    // C55: URL canonicalization + dedup by canonical key.
    "q_url_dedup" -> { (s, dir) =>
      val d = t(s, dir, "documents").withColumn("url", messyUrl)
      DomainCuration.urlDedup(d, col("url"), col("doc_id"))
        .orderBy(col("canonical_url"))
    },

    // C54: semantic near-dup pairs blocked by fixed-anchor cells.
    "q_semantic_dedup" -> { (s, dir) =>
      SemanticDedup.nearDupPairs(t(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), SemThreshold, SemAnchors)
        .select(col("id_a"), col("id_b"), col("cell"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("id_a"), col("id_b"))
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

    // C133: winnowing (MOSS) fingerprint candidates — deterministic
    // local-run guarantee (any shared >= w+k-1 token run shares a
    // fingerprint), kernel-selected window minima, rare-df anchoring.
    "q_winnow_pairs" -> { (s, dir) =>
      graft.ops.Winnowing.candidatePairs(
          TextQueries.docsWithPlantedDups(s, dir), col("doc_id"), col("text"),
          k = 3, w = WinnowW, maxDf = 10, minShared = 2)
        .orderBy(col("id_a"), col("id_b"))
    },

    // C85: one-permutation MinHash near-dup — one md5 per shingle
    // (vs 16 affine maps in q_dedup_minhash), bins + rotation
    // densification, same band→bucket→exact-verify pipeline over the
    // planted-dup corpus.
    "q_dedup_oph" -> { (s, dir) =>
      Dedup.ophMinHashLsh(TextQueries.docsWithPlantedDups(s, dir),
          col("doc_id"), col("text"),
          shingleK = 3, numBins = OphBins, bands = OphBands,
          threshold = OphThreshold)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // C21 scale path: large-star/small-star contraction closes any
    // component in O(log n) rounds regardless of diameter (min-label
    // propagation needs diameter rounds — pathological on chain-shaped
    // dup graphs). Same pair graph and output contract as
    // q_dup_clusters, so the same recursive-CTE twin oracles it.
    "q_dup_clusters_star" -> { (s, dir) =>
      val pairs = Dedup.ngramJaccard(
          TextQueries.docsWithPlantedDups(s, dir), col("doc_id"), col("text"),
          blockBy = TextQueries.prefixBlock(col("text")),
          shingleK = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      DupClusters.connectedComponentsStar(pairs).orderBy(col("doc_id"))
    },

    // C82: paragraph-level first-occurrence dedup — the corpus is
    // re-chunked into 8-token paragraphs plus a planted footer every
    // doc shares (the construction device: same construction in the
    // twin), so exactly one doc keeps the footer. The chunking is
    // ONE codegen'd regex pass (break after every 8th token) — the
    // transform(sequence, slice) formulation it replaces is an
    // interpreted HOF whose lambda captures the tokenize subtree and
    // re-evaluates it per paragraph (~80 re-tokenizations per doc,
    // 5.8 s -> 0.3 s at sf1; the C30 defect class).
    "q_paragraph_dedup" -> { (s, dir) =>
      // TokenLinesExpr kernel replaces the normalize + backtracking
      // group-capture regexp_replace paragraph synthesizer (equality
      // spec-pinned in TokenLinesExprSpec, trailing-whitespace edges
      // included)
      val chunked = graft.plans.TokenLinesExpr.tokenLines(col("text"), ParaTokens, "\n\n")
      val aug = t(s, dir, "documents").select(col("doc_id"),
        concat(chunked, lit("\n\n"), lit(ParaFooter)).as("ptext"))
      ParagraphDedup.dedup(aug, col("doc_id"), col("ptext"))
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          md5(col("text_kept")).as("kept_md5"))
        .orderBy(col("doc_id"))
    },

    // C88: quality-aware duplicate-cluster retention — keep the
    // highest-logit member of every near-dup cluster (ties to the
    // smaller id), clusters from the C21 star-contraction path.
    "q_cluster_retention" -> { (s, dir) =>
      val corpus = TextQueries.docsWithPlantedDups(s, dir)
      val pairs = Dedup.ngramJaccard(corpus, col("doc_id"), col("text"),
          blockBy = TextQueries.prefixBlock(col("text")),
          shingleK = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val quality = QualityClassifier.score(corpus, col("doc_id"), col("text"))
      Retention.keepBest(pairs, quality, col("doc_id"), col("logit_milli"))
        .orderBy(col("doc_id"))
    },

    // C91: dedup-quality metrics — the C85 banding's candidate
    // recall/precision measured against the blocked exact-Jaccard
    // ground truth (tune (bins, bands) on measured data, not the
    // textbook S-curve).
    // bands=2 (rows=8) against truth threshold 0.4: the S-curve
    // crosses ~0.84, so the half-prefix true pairs (jaccard ≈ 0.48)
    // genuinely MISS — recall is partial, not a trivial 1000
    "q_lsh_recall" -> { (s, dir) =>
      DedupEval.ophCandidateMetrics(docsWithMixedDups(s, dir),
        col("doc_id"), col("text"),
        blockBy = TextQueries.prefixBlock(col("text")),
        shingleK = 3, numBins = 16, bands = 2, threshold = 0.4)
    },

    // C64: corpus-unique shingle fraction — the corpus-level
    // boilerplate signal pair-wise dedup cannot see.
    "q_novelty" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      Novelty.score(d, col("doc_id"), col("text"), shingleK = 3)
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

    // C80: semantic decontamination — train rows sharing an anchor
    // cell with an eval row at cosine >= threshold; eval broadcast,
    // train never shuffles.
    "q_semantic_decon" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val eval = emb.filter(pmod(col("vec_id"), lit(EvalMod)) === 0)
      val train = emb.filter(pmod(col("vec_id"), lit(EvalMod)) =!= 0)
      Decontaminate.semanticHits(train, col("vec_id"), col("embedding"),
          eval, col("vec_id"), col("embedding"), DeconThreshold, DeconAnchors)
        .orderBy(col("train_id"))
    },

    // C89: span-level contamination localization — every train-doc
    // position whose 5-token span occurs verbatim in the eval split,
    // with the eval doc responsible; eval vocabulary broadcast, the
    // train side never shuffles.
    "q_contam_spans" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(ContamEvalMod)) =!= 0)
      val eval = docs.filter(pmod(col("doc_id"), lit(ContamEvalMod)) === 0)
      Decontaminate.spanHits(train, col("doc_id"), col("text"),
          eval, col("doc_id"), col("text"), ContamK)
        .orderBy(col("doc_id"), col("pos"), col("eval_id"))
    }
  )

  /** OPH-MinHash banding candidate CTE chain (expects `sh(doc_id,
    * shingles)` in scope): bh → ob → om → banded → `cand(id_a,
    * id_b)` — shared by q_dedup_oph's verify and C91's metrics twin.
    */
  private[queries] lazy val ophCandCtes: String = ophCandCtesFor(OphBins, OphBands)

  private[queries] def ophCandCtesFor(bins: Int, bands: Int): String = {
    val p = graft.plans.OphMinHashOps.P
    val rawBins = (0 until bins)
      .map(i => s"list_min(list_filter(hs, h -> h % $bins = $i))")
      .mkString("[", ",\n           ", "]")
    val densified = (0 until bins).map { i =>
      val rotation = (0 until bins)
        .map(j => s"rawb[${(i + j) % bins + 1}]").mkString(", ")
      s"coalesce($rotation, $p)"
    }.mkString("[", ",\n           ", "]")
    val rows = bins / bands
    val bandSelects = (0 until bands).map { b =>
      val elems = (1 to rows).map(j => s"sig[${b * rows + j}]").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $elems)) AS band_key FROM om"
    }.mkString("\n  UNION ALL ")
    s"""bh AS (SELECT doc_id, shingles,
       |         list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % $p) AS hs
       |       FROM sh),
       |ob AS (SELECT doc_id, shingles,
       |         $rawBins AS rawb
       |       FROM bh),
       |om AS (SELECT doc_id, shingles,
       |         $densified AS sig
       |       FROM ob),
       |banded AS (
       |  $bandSelects),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |         FROM banded x JOIN banded y
       |           ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id)""".stripMargin
  }

  /** The C82 twin, parameterized on the oracle's hash-range shard
    * count (a twin-side memory device — results are shard-invariant,
    * which the fuzz harness exercises; see ParagraphDedup.dedupSql).
    */
  def paragraphDedupOracle(shards: Int): String =
    s"""WITH paug AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(trim(text), '\\s+', ' ', 'g'),
       |      '((?:[^ ]+ ){${ParaTokens - 1}}[^ ]+) ', '\\1' || e'\\n\\n', 'g')
       |      || e'\\n\\n' || '$ParaFooter' AS ptext
       |  FROM documents),
       |${ParagraphDedup.dedupSql("paug", shards = shards)}
       |SELECT doc_id, n_paras, n_kept, kept_md5
       |FROM pdd ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(

    "q_winnow_pairs" ->
      s"""WITH ${TextQueries.allDocsCte},
         |${graft.ops.Winnowing.candidatePairsSql(k = 3, w = WinnowW,
             maxDf = 10, minShared = 2)}
         |SELECT id_a, id_b, n_shared FROM wpr ORDER BY id_a, id_b""".stripMargin,

    "q_prefix_dedup" ->
      s"""WITH pp AS (SELECT doc_id,
         |  md5(array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[1:$PrefixK], ' ')) AS prefix_md5
         |  FROM documents)
         |SELECT prefix_md5, count(*) AS n_docs, min(doc_id) AS kept_doc
         |FROM pp GROUP BY prefix_md5 HAVING count(*) > 1
         |ORDER BY prefix_md5""".stripMargin,

    "q_normalized_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        |  count(DISTINCT md5(text)) AS n_raw_variants
        |FROM documents
        |GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))
        |ORDER BY keep_id""".stripMargin,

    "q_url_dedup" ->
      s"""WITH uu AS (SELECT doc_id, $messyUrlSql AS url FROM documents),
         |uc AS (SELECT doc_id, ${DomainCuration.canonicalizeUrlSql("url")} AS canonical_url FROM uu)
         |SELECT min(canonical_url) AS canonical_url, count(*) AS n_docs, min(doc_id) AS kept_doc
         |FROM uc GROUP BY ('0x' || substr(md5(canonical_url), 1, 15))::BIGINT
         |ORDER BY canonical_url""".stripMargin,

    "q_semantic_dedup" ->
      s"""WITH ${SemanticDedup.nearDupPairsSql(SemThreshold, SemAnchors)}
         |SELECT id_a, id_b, cell, round(cos_sim, 4) AS cos_sim
         |FROM sdp ORDER BY id_a, id_b""".stripMargin,

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

    "q_dedup_oph" ->
      s"""WITH ${TextQueries.allDocsCte},
         |${TextQueries.shinglesCte},
         |$ophCandCtes,
         |j AS (SELECT c.id_a, c.id_b,
         |        CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         |          / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jac
         |      FROM cand c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id)
         |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM j
         |WHERE jac >= $OphThreshold ORDER BY id_a, id_b""".stripMargin,

    // identical output contract to q_dup_clusters — same twin
    "q_dup_clusters_star" -> TextQueries.oracles("q_dup_clusters"),

    "q_paragraph_dedup" -> paragraphDedupOracle(shards = 8),

    "q_cluster_retention" ->
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
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         |${QualityClassifier.scoreSql("all_docs")},
         |qrel AS (SELECT doc_id, logit_milli AS q FROM qscored),
         |${Retention.keepBestSql}
         |SELECT doc_id, cluster_id, quality, is_kept
         |FROM ret ORDER BY doc_id""".stripMargin,

    "q_lsh_recall" ->
      s"""WITH $mixedDocsCte,
         |all_docs AS (SELECT * FROM mx_docs),
         |${TextQueries.shinglesCte},
         |${ophCandCtesFor(16, 2)},
         |blk AS (SELECT doc_id, ${TextQueries.prefixBlockSql("text")} AS block FROM all_docs),
         |prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |        FROM blk ba JOIN blk bb ON bb.block = ba.block AND ba.doc_id < bb.doc_id
         |        JOIN sh a ON a.doc_id = ba.doc_id
         |        JOIN sh b ON b.doc_id = bb.doc_id
         |        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         |              / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.4),
         |${DedupEval.metricsSql}
         |SELECT n_true, n_cand, n_cand_true, recall_milli, precision_milli
         |FROM deval""".stripMargin,

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

    "q_semantic_decon" ->
      s"""WITH ${Decontaminate.semanticHitsSql(
             s"vec_id % $EvalMod <> 0", s"vec_id % $EvalMod = 0",
             DeconThreshold, DeconAnchors)}
         |SELECT train_id, n_eval_hits, max_cos
         |FROM sdh ORDER BY train_id""".stripMargin,

    "q_contam_spans" ->
      s"""WITH ${Decontaminate.spanHitsSql(
             s"doc_id % $ContamEvalMod <> 0", s"doc_id % $ContamEvalMod = 0", ContamK)}
         |SELECT doc_id, pos, eval_id
         |FROM sph ORDER BY doc_id, pos, eval_id""".stripMargin
  )
}
