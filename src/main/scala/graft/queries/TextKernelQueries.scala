package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{BpeTrain, NgramLm, Scrub, ZipfFit}
import graft.plans.{CharEntropyExprOps, UnicodeNormalizeOps}

/** Tokenizer / text-kernel queries: PII redaction (C72), Unicode NFC
  * canonicalization (C71), dictionary phrase matching (C77),
  * distributed BPE training (C75), BPE application (C81), tokenizer
  * fertility (C93), Kneser-Ney bigram scoring (C86), single-pass
  * char-distribution entropy (C83), and the Zipf rank-frequency fit
  * (C90).
  *
  * The synthetic `documents` table carries no natural PII or
  * denormalized Unicode, so those queries CONSTRUCT the interesting
  * content deterministically from doc_id INSIDE the query — with the
  * identical construction in the DuckDB twin — so the regex chain /
  * normalizer is exercised on per-row-distinct matches rather than
  * trivially passing on a no-op corpus. The planted-fixture edge
  * cases live in the ScalaTest specs.
  */
object TextKernelQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  val BpeMerges = 6
  val BlockPhrases: Seq[String] =
    Seq("table scan", "fast merge", "agg row", "value table", "slow filter")
  /** BPE rounds for the encode query (kept below merge exhaustion). */
  val EncodeMerges = 6

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C72: PII scrubbing — staged email → IPv4 → digit-run redaction
    // with per-stage counts; pure narrow map, RE2-portable patterns.
    "q_pii_redact" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val aug = d.select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com via 10.0."),
          pmod(col("doc_id"), lit(256L)).cast("string"),
          lit(".77 ref "),
          (col("doc_id") * lit(1009L)).cast("string")).as("text"))
      Scrub.redactPii(aug, col("doc_id"), col("text"))
        .orderBy(col("id"))
    },

    // C71: Unicode NFC canonicalization — the native Normalizer
    // expression vs DuckDB's nfc_normalize, plus the replacement-char
    // (mojibake) count; planted combining marks compose so
    // len_raw > len_nfc on every row.
    "q_nfc_normalize" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val aug = d.select(col("doc_id"),
        concat(col("text"), lit(" café "), lit("�"),
          lit(" naïve")).as("raw"))
      aug.select(col("doc_id"),
        UnicodeNormalizeOps.nfc(col("raw")).as("nfc"),
        length(col("raw")).cast("bigint").as("len_raw"),
        length(UnicodeNormalizeOps.nfc(col("raw"))).cast("bigint").as("len_nfc"),
        (length(col("raw")) -
          length(regexp_replace(col("raw"), "�", ""))).cast("bigint").as("n_bad"))
        .orderBy(col("doc_id"))
    },

    // C77: dictionary phrase matching — one Aho–Corasick pass counts
    // every (overlapping) occurrence of each blocklist phrase; the
    // corpus's own bigrams occur organically, so counts are non-trivial.
    "q_phrase_match" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
          posexplode(graft.plans.PhraseMatchExpr.counts(col("text"), BlockPhrases)))
        .filter(col("col") > 0)
        .select(col("doc_id"),
          element_at(array(BlockPhrases.map(lit): _*), col("pos") + 1).as("phrase"),
          col("col").as("n"))
        .orderBy(col("doc_id"), col("phrase"))
    },

    // C75: distributed BPE tokenizer training — the iterative merge
    // loop over the word-frequency table; unrolled-CTE twin.
    "q_bpe_train" -> { (s, dir) =>
      BpeTrain.learnMerges(t(s, dir, "documents"), col("text"), BpeMerges)
        .orderBy(col("merge_rank"))
    },

    // C81: tokenizer application — encode every document under the
    // C75-trained BPE vocabulary (no merge replay: docs join the
    // encoded (word, rep) vocab).
    "q_bpe_encode" -> { (s, dir) =>
      BpeTrain.encode(t(s, dir, "documents"),
          col("doc_id"), col("text"), EncodeMerges)
        .orderBy(col("doc_id"))
    },

    // C93: tokenizer fertility per language under the C75-trained
    // BPE vocabulary — tokens per word and chars per token from
    // exact integer sums.
    "q_bpe_fertility" -> { (s, dir) =>
      BpeTrain.fertility(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("lang"), nMerges = 6)
        .orderBy(col("group"))
    },

    // C86: Kneser-Ney bigram perplexity scoring — absolute-discount
    // back-off weighted by CONTINUATION counts (vs C37's
    // Jelinek-Mercer unigram mixture).
    "q_kn_score" -> { (s, dir) =>
      NgramLm.kneserNeyScore(t(s, dir, "documents"),
          col("doc_id"), col("text"), discount = 0.75)
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

    // C90: Zipf rank-frequency fit per source — log-log slope and
    // linearity from competition ranks, integer-exact moments.
    "q_zipf_fit" -> { (s, dir) =>
      ZipfFit.fit(t(s, dir, "documents"), col("source"), col("text"))
        .orderBy(col("source"))
    },

    // C130: Heaps vocabulary-growth fit — V(n) ~ K·n^beta over 8
    // id-range checkpoints, closed-form integer bucketing (no global
    // window, no per-checkpoint rescan), C90's exact moment device.
    "q_heaps_fit" -> { (s, dir) =>
      graft.ops.HeapsFit.fit(t(s, dir, "documents"), col("doc_id"), col("text"),
        nCheckpoints = 8)
    }
  )

  val oracles: Map[String, String] = Map(

    "q_pii_redact" ->
      s"""WITH aug AS (SELECT doc_id,
         |  text || ' contact user' || CAST(doc_id AS VARCHAR)
         |       || '@example.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         |       || '.77 ref ' || CAST(doc_id * 1009 AS VARCHAR) AS t
         |  FROM documents)
         |SELECT ${Scrub.redactPiiSql("doc_id", "t")}
         |FROM aug ORDER BY id""".stripMargin,

    "q_nfc_normalize" ->
      """WITH aug AS (SELECT doc_id,
        |  text || ' cafe' || chr(769) || ' ' || chr(65533)
        |       || ' nai' || chr(776) || 've' AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS nfc,
        |  CAST(length(raw) AS BIGINT) AS len_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
        |  CAST(length(raw) - length(replace(raw, chr(65533), '')) AS BIGINT) AS n_bad
        |FROM aug ORDER BY doc_id""".stripMargin,

    "q_phrase_match" -> {
      val values = BlockPhrases.map(p => s"('$p')").mkString(", ")
      s"""WITH ph AS (SELECT * FROM (VALUES $values) AS t(phrase))
         |SELECT d.doc_id, ph.phrase, count(*) AS n
         |FROM documents d
         |CROSS JOIN ph
         |CROSS JOIN unnest(range(1, length(d.text) + 1)) AS g(i)
         |WHERE substr(lower(d.text), CAST(g.i AS INT), length(ph.phrase)) = ph.phrase
         |GROUP BY d.doc_id, ph.phrase
         |ORDER BY d.doc_id, ph.phrase""".stripMargin
    },

    "q_bpe_train" ->
      BpeTrain.learnMergesSql("documents", BpeMerges),

    "q_bpe_encode" ->
      s"""WITH ${BpeTrain.encodeSql("documents", EncodeMerges)}
         |SELECT doc_id, n_words, n_bpe_tokens
         |FROM bpenc ORDER BY doc_id""".stripMargin,

    "q_bpe_fertility" ->
      s"""WITH ${BpeTrain.fertilitySql("documents", "lang", nMerges = 6)}
         |SELECT "group", n_docs, n_words, n_bpe_tokens, n_chars,
         |  fertility_milli, chars_per_token_milli
         |FROM bfert ORDER BY "group"""".stripMargin,

    "q_kn_score" ->
      s"""WITH ${NgramLm.kneserNeyScoreSql("documents", discount = 0.75)}
         |SELECT doc_id, n_bigrams, avg_logprob
         |FROM knsc ORDER BY doc_id""".stripMargin,

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

    "q_zipf_fit" ->
      s"""WITH ${ZipfFit.fitSql("documents")}
         |SELECT source, n_terms, n_tokens, slope, corr
         |FROM zipf ORDER BY source""".stripMargin,

    "q_heaps_fit" -> graft.ops.HeapsFit.fitSql(nCheckpoints = 8)
  )
}
