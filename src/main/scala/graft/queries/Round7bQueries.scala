package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Allocation, Scrub}
import graft.plans.UnicodeNormalizeOps

/** Round-7 hygiene/sampling queries: PII redaction, Unicode NFC
  * canonicalization, Hamilton proportional stratified sampling.
  *
  * The synthetic `documents` table carries no natural PII or
  * denormalized Unicode, so these queries CONSTRUCT the interesting
  * content deterministically from doc_id INSIDE the query — with the
  * identical construction in the DuckDB twin — so the regex chain /
  * normalizer is exercised on per-row-distinct matches rather than
  * trivially passing on a no-op corpus. The planted-fixture edge
  * cases live in the ScalaTest specs.
  */
object Round7bQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  val PropK = 60
  val TfIdfMaxDf = 10
  val TfIdfTau = 0.3
  val BpeMerges = 6
  val SkewTopN = 10
  val BlockPhrases: Seq[String] =
    Seq("table scan", "fast merge", "agg row", "value table", "slow filter")
  val EmbDim2 = 64
  val PqM = 4
  val PqK = 4
  val PqIters = 2
  val PqTopK = 20

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
        concat(col("text"), lit(" cafe\u0301 "), lit("\uFFFD"),
          lit(" nai\u0308ve")).as("raw"))
      aug.select(col("doc_id"),
        UnicodeNormalizeOps.nfc(col("raw")).as("nfc"),
        length(col("raw")).cast("bigint").as("len_raw"),
        length(UnicodeNormalizeOps.nfc(col("raw"))).cast("bigint").as("len_nfc"),
        (length(col("raw")) -
          length(regexp_replace(col("raw"), "\uFFFD", ""))).cast("bigint").as("n_bad"))
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

    // C78: product-quantization ANN — m integer sub-codebooks, narrow
    // argmin encode, ADC top-k by LUT-literal integer sums.
    "q_pq_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val corpus = e.filter(col("vec_id") =!= 0L)
      val cb = graft.ops.PqIndex.fitCodebooks(corpus, col("vec_id"), col("embedding"),
        dim = EmbDim2, m = PqM, k = PqK, iters = PqIters)
      val codes = graft.ops.PqIndex.encode(corpus, col("vec_id"), col("embedding"), cb)
      val qv = e.filter(col("vec_id") === 0L)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
      graft.ops.PqIndex.adcTopK(codes, qv, cb, PqTopK)
        .orderBy(col("adc_dist"), col("vec_id"))
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

    // C76: key-skew diagnosis — heavy keys via the bounded heap plus
    // exact nearest-rank group-size percentiles; the pre-shuffle audit
    // that decides salting/AQE for a key.
    "q_key_skew" -> { (s, dir) =>
      graft.ops.Diagnostics.keySkew(t(s, dir, "events"), col("user_id"), SkewTopN)
        .orderBy(col("rank"))
    },

    // C75: distributed BPE tokenizer training — the iterative merge
    // loop over the word-frequency table; unrolled-CTE twin.
    "q_bpe_train" -> { (s, dir) =>
      graft.ops.BpeTrain.learnMerges(t(s, dir, "documents"), col("text"), BpeMerges)
        .orderBy(col("merge_rank"))
    },

    // C74: idf-weighted all-pairs cosine — posting-list self-join with
    // df-pruned fan-out; planted dups (suffix-appended replicas) land
    // near cosine 1 while unrelated token-soup pairs stay below τ.
    "q_tfidf_pairs" -> { (s, dir) =>
      val corpus = TextQueries.docsWithPlantedDups(s, dir)
      graft.ops.TfIdf.similarPairs(corpus, col("doc_id"), col("text"),
          shingleK = 3, maxDf = TfIdfMaxDf, threshold = TfIdfTau)
        .select(col("id_a"), col("id_b"), col("dot_milli2"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
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

    "q_bpe_train" ->
      graft.ops.BpeTrain.learnMergesSql("documents", BpeMerges),

    "q_key_skew" ->
      graft.ops.Diagnostics.keySkewSql("events", "user_id", SkewTopN),

    "q_pq_topk" ->
      graft.ops.PqIndex.pqSql(EmbDim2, PqM, PqK, PqIters, PqTopK),

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

    "q_tfidf_pairs" ->
      s"""WITH ${TextQueries.allDocsCte},
         |${TextQueries.shinglesCte},
         |e AS (SELECT DISTINCT doc_id, ${PipelineQueries.hash60("u.s")} AS h
         |      FROM sh, unnest(sh.shingles) AS u(s)),
         |nn AS (SELECT count(*) AS n_docs FROM all_docs),
         |dfc AS (SELECT h, count(*) AS df FROM e GROUP BY h
         |        HAVING count(*) <= $TfIdfMaxDf),
         |wts AS (SELECT e.doc_id, e.h, dfc.df,
         |          CAST(floor(ln(CAST(n_docs + 1 AS DOUBLE)
         |            / CAST(df + 1 AS DOUBLE)) * 1000) AS BIGINT) AS idf
         |        FROM e JOIN dfc USING (h), nn),
         |nsq AS (SELECT doc_id, CAST(SUM(idf * idf) AS BIGINT) AS nsq
         |        FROM wts GROUP BY doc_id),
         |dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |           CAST(SUM(a.idf * b.idf) AS BIGINT) AS dot_milli2
         |         FROM wts a JOIN wts b ON a.h = b.h AND a.doc_id < b.doc_id
         |         WHERE a.df >= 2
         |         GROUP BY 1, 2),
         |c AS (SELECT d.id_a, d.id_b, d.dot_milli2,
         |        CAST(d.dot_milli2 AS DOUBLE)
         |          / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine
         |      FROM dots d
         |      JOIN nsq na ON na.doc_id = d.id_a
         |      JOIN nsq nb ON nb.doc_id = d.id_b)
         |SELECT id_a, id_b, dot_milli2, round(cosine, 4) AS cosine
         |FROM c WHERE cosine >= $TfIdfTau ORDER BY id_a, id_b""".stripMargin
  )
}
