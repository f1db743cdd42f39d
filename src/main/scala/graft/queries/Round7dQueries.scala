package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Decontaminate, Dedup, PerplexityBuckets, QualityClassifier, Retention, ZipfFit}

/** Round-7 continuation (batch d): CCNet perplexity bucketing,
  * quality-aware cluster retention, span-level contamination
  * localization, Zipf rank-frequency diagnostics.
  */
object Round7dQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Span width for contamination localization (q_dup_spans' k). */
  val ContamK = 5
  /** Eval split for span localization: every 20th doc plays eval. */
  val ContamEvalMod = 20L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C87: CCNet-style perplexity bucketing — KN-scored docs split
    // per language into head/middle/tail thirds via the
    // histogram-device NTILE (no per-row group window).
    "q_ppl_buckets" -> { (s, dir) =>
      PerplexityBuckets.bucketize(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("lang"))
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
    },

    // C90: Zipf rank-frequency fit per source — log-log slope and
    // linearity from competition ranks, integer-exact moments.
    "q_zipf_fit" -> { (s, dir) =>
      ZipfFit.fit(t(s, dir, "documents"), col("source"), col("text"))
        .orderBy(col("source"))
    })

  val oracles: Map[String, String] = Map(

    "q_ppl_buckets" ->
      s"""WITH ${PerplexityBuckets.bucketizeSql("documents")}
         |SELECT doc_id, lang, n_bigrams, avg_logprob, ppl_bucket
         |FROM pplb ORDER BY doc_id""".stripMargin,

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

    "q_contam_spans" ->
      s"""WITH ${Decontaminate.spanHitsSql(
             s"doc_id % $ContamEvalMod <> 0", s"doc_id % $ContamEvalMod = 0", ContamK)}
         |SELECT doc_id, pos, eval_id
         |FROM sph ORDER BY doc_id, pos, eval_id""".stripMargin,

    "q_zipf_fit" ->
      s"""WITH ${ZipfFit.fitSql("documents")}
         |SELECT source, n_terms, n_tokens, slope, corr
         |FROM zipf ORDER BY source""".stripMargin)
}
