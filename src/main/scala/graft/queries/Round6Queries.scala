package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, DomainCuration, ImportanceWeights, SemanticDedup}

/** Round-6 capability queries: domain-level curation (A-series web
  * hygiene), DSIR importance weighting, semantic (embedding-cell)
  * dedup, and wide→long unpivot. Oracle rules per SURVEY §4.
  */
object Round6Queries {

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

  val DomainCap = 5
  val IwBuckets = 1024
  val PrefixK = 10
  val SemThreshold = 0.2

  /** 64 cells, not 8: within-cell pair work is quadratic in cell
    * size, so the cell count must grow with the corpus (SemDeDup
    * runs ~10k clusters at web scale) — 8 cells measured 67 s at the
    * 10× bench SF where 64 cells hold the query near-linear.
    */
  val SemAnchors: Seq[Seq[Double]] = SemanticDedup.anchors(dim = 64, k = 64)

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

    // C54: semantic near-dup pairs blocked by fixed-anchor cells.
    "q_semantic_dedup" -> { (s, dir) =>
      SemanticDedup.nearDupPairs(t(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), SemThreshold, SemAnchors)
        .select(col("id_a"), col("id_b"), col("cell"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // C55: URL canonicalization + dedup by canonical key.
    "q_url_dedup" -> { (s, dir) =>
      val d = t(s, dir, "documents").withColumn("url", messyUrl)
      DomainCuration.urlDedup(d, col("url"), col("doc_id"))
        .orderBy(col("canonical_url"))
    },

    // C56: prefix dedup — docs sharing their first 10 tokens.
    "q_prefix_dedup" -> { (s, dir) =>
      Dedup.prefixGroups(t(s, dir, "documents"), col("doc_id"), col("text"), k = PrefixK)
        .orderBy(col("prefix_md5"))
    },

    // A45: unpivot / melt — wide measure columns to long
    // (measure, value) rows, the inverse of A28's pivot.
    "q_unpivot" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          col("p_size").cast("double").as("p_size"),
          col("p_retailprice").cast("double").as("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "measure", "value")
        .orderBy(col("p_partkey"), col("measure"))
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

    "q_semantic_dedup" ->
      s"""WITH ${SemanticDedup.nearDupPairsSql(SemThreshold, SemAnchors)}
         |SELECT id_a, id_b, cell, round(cos_sim, 4) AS cos_sim
         |FROM sdp ORDER BY id_a, id_b""".stripMargin,

    "q_url_dedup" ->
      s"""WITH uu AS (SELECT doc_id, $messyUrlSql AS url FROM documents),
         |uc AS (SELECT doc_id, ${DomainCuration.canonicalizeUrlSql("url")} AS canonical_url FROM uu)
         |SELECT min(canonical_url) AS canonical_url, count(*) AS n_docs, min(doc_id) AS kept_doc
         |FROM uc GROUP BY ('0x' || substr(md5(canonical_url), 1, 15))::BIGINT
         |ORDER BY canonical_url""".stripMargin,

    "q_prefix_dedup" ->
      s"""WITH pp AS (SELECT doc_id,
         |  md5(array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[1:$PrefixK], ' ')) AS prefix_md5
         |  FROM documents)
         |SELECT prefix_md5, count(*) AS n_docs, min(doc_id) AS kept_doc
         |FROM pp GROUP BY prefix_md5 HAVING count(*) > 1
         |ORDER BY prefix_md5""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS value FROM part
        |ORDER BY p_partkey, measure""".stripMargin
  )
}
