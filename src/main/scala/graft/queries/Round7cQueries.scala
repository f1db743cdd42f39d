package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{BitextMining, BpeTrain, Decontaminate, Dedup, DupClusters, NgramLm, Outliers, ParagraphDedup, SemanticDedup}
import graft.plans.CharEntropyExprOps

/** Round-7 continuation: robust outlier gating and cross-corpus
  * semantic decontamination.
  */
object Round7cQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** MAD multiples for the outlier gate, in milli-units (2500 = 2.5·MAD). */
  val OutlierKMilli = 2500L
  /** Same anchors/threshold family as q_semantic_dedup (C54). */
  val DeconThreshold = 0.25
  val DeconAnchors: Seq[Seq[Double]] = SemanticDedup.anchors(dim = 64, k = 64)
  /** Eval split: every 20th embedding plays the eval set. */
  val EvalMod = 20L
  /** BPE rounds for the encode query (kept below merge exhaustion). */
  val EncodeMerges = 6
  /** Paragraph construction: tokens per synthetic paragraph + the
    * planted boilerplate footer every document carries.
    */
  val ParaTokens = 8
  val ParaFooter = "standard footer boilerplate paragraph"
  /** Bitext mining: neighborhood size + ratio-margin gate (1.2 —
    * cuts the mutual-top-1 set from 125 to 34 pairs at sf0.01, so the
    * margin itself is exercised, not just mutuality). */
  val BitextK = 4
  val BitextMarginMilli = 1200L
  /** OPH signature: bins, bands, verify threshold (q_dedup_minhash's). */
  val OphBins = 16
  val OphBands = 4
  val OphThreshold = 0.5
  /** LSH mining: planes sized so the bench corpus keeps candidates. */
  val BitextPlanes = 4

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // C81: tokenizer application — encode every document under the
    // C75-trained BPE vocabulary (no merge replay: docs join the
    // encoded (word, rep) vocab).
    "q_bpe_encode" -> { (s, dir) =>
      BpeTrain.encode(t(s, dir, "documents"),
          col("doc_id"), col("text"), EncodeMerges)
        .orderBy(col("doc_id"))
    },

    // C82: paragraph-level first-occurrence dedup — the corpus is
    // re-chunked into 8-token paragraphs plus a planted footer every
    // doc shares (the Round7b construction device: same construction
    // in the twin), so exactly one doc keeps the footer. The chunking
    // is ONE codegen'd regex pass (break after every 8th token) — the
    // transform(sequence, slice) formulation it replaces is an
    // interpreted HOF whose lambda captures the tokenize subtree and
    // re-evaluates it per paragraph (~80 re-tokenizations per doc,
    // 5.8 s -> 0.3 s at sf1; the C30 defect class).
    "q_paragraph_dedup" -> { (s, dir) =>
      val norm = regexp_replace(trim(col("text")), "\\s+", " ")
      val chunked = regexp_replace(norm,
        s"((?:[^ ]+ ){${ParaTokens - 1}}[^ ]+) ", "$1\n\n")
      val aug = t(s, dir, "documents").select(col("doc_id"),
        concat(chunked, lit("\n\n"), lit(ParaFooter)).as("ptext"))
      ParagraphDedup.dedup(aug, col("doc_id"), col("ptext"))
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          md5(col("text_kept")).as("kept_md5"))
        .orderBy(col("doc_id"))
    },

    // C83: char-distribution entropy — the single-pass codegen
    // kernel; zero shuffle (the explode+groupBy formulation this
    // replaces exchanges every character of the corpus).
    "q_char_entropy" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), CharEntropyExprOps.stats(col("text")).as("st"))
        .select(col("doc_id"), col("st.n_chars").as("n_chars"),
          col("st.n_distinct_chars").as("n_distinct_chars"),
          col("st.entropy_micro").as("entropy_micro"))
        .orderBy(col("doc_id"))
    },

    // C84: margin-based bitext mining — mutual top-1 pairs across
    // the parity-split embedding corpus, ratio margin in integer
    // micro-cosine arithmetic.
    "q_bitext_margin" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val src = emb.filter(pmod(col("vec_id"), lit(2L)) === 0)
      val tgt = emb.filter(pmod(col("vec_id"), lit(2L)) === 1)
      BitextMining.minePairs(src, col("vec_id"), col("embedding"),
          tgt, col("vec_id"), col("embedding"), BitextK, BitextMarginMilli)
        .orderBy(col("src_id"))
    },

    // C84 scale path: LSH-bucketed mining — candidates only within
    // shared sign-buckets, each pair's cosine scored ONCE for both
    // direction rankings.
    "q_bitext_lsh" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val src = emb.filter(pmod(col("vec_id"), lit(2L)) === 0)
      val tgt = emb.filter(pmod(col("vec_id"), lit(2L)) === 1)
      BitextMining.minePairsLsh(src, col("vec_id"), col("embedding"),
          tgt, col("vec_id"), col("embedding"), BitextK, BitextMarginMilli,
          dim = 64, nPlanes = BitextPlanes)
        .orderBy(col("src_id"))
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

    // C86: Kneser-Ney bigram perplexity scoring — absolute-discount
    // back-off weighted by CONTINUATION counts (vs C37's
    // Jelinek-Mercer unigram mixture).
    "q_kn_score" -> { (s, dir) =>
      NgramLm.kneserNeyScore(t(s, dir, "documents"),
          col("doc_id"), col("text"), discount = 0.75)
        .orderBy(col("doc_id"))
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
    })

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

  val oracles: Map[String, String] = Map(

    "q_robust_outliers" ->
      s"""WITH ${Outliers.robustFlagsSql("documents", "doc_id", "lang", "n_chars", OutlierKMilli)}
         |SELECT id AS doc_id, "group" AS lang, value AS n_chars,
         |  med, mad, robust_z_milli, is_outlier
         |FROM rof ORDER BY doc_id""".stripMargin,

    "q_semantic_decon" ->
      s"""WITH ${Decontaminate.semanticHitsSql(
             s"vec_id % $EvalMod <> 0", s"vec_id % $EvalMod = 0",
             DeconThreshold, DeconAnchors)}
         |SELECT train_id, n_eval_hits, max_cos
         |FROM sdh ORDER BY train_id""".stripMargin,

    "q_bpe_encode" ->
      s"""WITH ${BpeTrain.encodeSql("documents", EncodeMerges)}
         |SELECT doc_id, n_words, n_bpe_tokens
         |FROM bpenc ORDER BY doc_id""".stripMargin,

    "q_paragraph_dedup" ->
      s"""WITH paug AS (
         |  SELECT doc_id,
         |    regexp_replace(regexp_replace(trim(text), '\\s+', ' ', 'g'),
         |      '((?:[^ ]+ ){${ParaTokens - 1}}[^ ]+) ', '\\1' || e'\\n\\n', 'g')
         |      || e'\\n\\n' || '$ParaFooter' AS ptext
         |  FROM documents),
         |${ParagraphDedup.dedupSql("paug")}
         |SELECT doc_id, n_paras, n_kept, kept_md5
         |FROM pdd ORDER BY doc_id""".stripMargin,

    "q_char_entropy" ->
      s"""WITH ceh AS (
         |  SELECT doc_id, u.ch
         |  FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents),
         |    unnest(cs) AS u(ch)),
         |cec AS (SELECT doc_id, ch, count(*) AS c FROM ceh GROUP BY doc_id, ch),
         |cet AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cec GROUP BY doc_id)
         |SELECT t.doc_id, t.n AS n_chars, count(*) AS n_distinct_chars,
         |  CAST(sum(CAST(floor(-(c.c / t.n) * ln(c.c / t.n) * 1e6) AS BIGINT))
         |    AS BIGINT) AS entropy_micro
         |FROM cec c JOIN cet t USING (doc_id)
         |GROUP BY t.doc_id, t.n ORDER BY t.doc_id""".stripMargin,

    "q_bitext_margin" ->
      s"""WITH ${BitextMining.minePairsSql(
             "vec_id % 2 = 0", "vec_id % 2 = 1", BitextK, BitextMarginMilli)}
         |SELECT src_id, tgt_id, cos_micro, margin_milli
         |FROM bmm ORDER BY src_id""".stripMargin,

    "q_bitext_lsh" ->
      s"""WITH ${BitextMining.minePairsLshSql(
             "vec_id % 2 = 0", "vec_id % 2 = 1", BitextK, BitextMarginMilli,
             dim = 64, nPlanes = BitextPlanes)}
         |SELECT src_id, tgt_id, cos_micro, margin_milli
         |FROM bml ORDER BY src_id""".stripMargin,

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

    "q_kn_score" ->
      s"""WITH ${NgramLm.kneserNeyScoreSql("documents", discount = 0.75)}
         |SELECT doc_id, n_bigrams, avg_logprob
         |FROM knsc ORDER BY doc_id""".stripMargin,

    // identical output contract to q_dup_clusters — same twin
    "q_dup_clusters_star" -> TextQueries.oracles("q_dup_clusters"))
}
