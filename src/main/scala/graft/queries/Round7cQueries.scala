package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{BpeTrain, Decontaminate, Outliers, ParagraphDedup, SemanticDedup}

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
    // in the twin), so exactly one doc keeps the footer.
    "q_paragraph_dedup" -> { (s, dir) =>
      val toks = split(trim(col("text")), "\\s+")
      val nPara = ((size(toks) + lit(ParaTokens - 1)) / lit(ParaTokens)).cast("int")
      val paras = transform(sequence(lit(0), nPara - 1),
        i => array_join(slice(toks, i * ParaTokens + 1, lit(ParaTokens)), " "))
      val aug = t(s, dir, "documents").select(col("doc_id"),
        array_join(concat(paras, array(lit(ParaFooter))), "\n\n").as("ptext"))
      ParagraphDedup.dedup(aug, col("doc_id"), col("ptext"))
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          md5(col("text_kept")).as("kept_md5"))
        .orderBy(col("doc_id"))
    })

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
      s"""WITH ppre AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |  FROM documents),
         |paug AS (
         |  SELECT doc_id, array_to_string(list_append(
         |    list_transform(range(0, (len(tk) + ${ParaTokens - 1}) // $ParaTokens),
         |      i -> array_to_string(
         |        tk[CAST(i * $ParaTokens + 1 AS INT):CAST((i + 1) * $ParaTokens AS INT)],
         |        ' ')),
         |    '$ParaFooter'), e'\\n\\n') AS ptext
         |  FROM ppre),
         |${ParagraphDedup.dedupSql("paug")}
         |SELECT doc_id, n_paras, n_kept, kept_md5
         |FROM pdd ORDER BY doc_id""".stripMargin)
}
