package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential PARAMETER fuzzing of the oracle harness: the 180
  * committed twins are hash-green at their committed constants; this
  * draws seeded random parameterizations (k, thresholds, λ, band/
  * shard counts, quantization scales) for the query builders whose
  * ops expose paired (Spark, twin-SQL) generators, dumps each result
  * to parquet + oracle_sql.json in the Verify layout, and lets
  * scripts/selfcheck.py assert Spark == DuckDB row-for-row. Catches
  * parity rules that only hold at the committed constants (λ = 0
  * tie-breaks, k beyond the common-item count, scale-floor edges,
  * twin-side shard invariance).
  *
  * Deterministic: one scala.util.Random(seed), families drawn
  * round-robin, so a seed identifies a config set exactly.
  */
object FuzzVerify {

  final case class Config(name: String,
      build: (SparkSession, String) => DataFrame, sql: String)

  def configs(seed: Long, n: Int): Seq[Config] = {
    val rnd = new scala.util.Random(seed)

    def emb(s: SparkSession, dir: String): DataFrame =
      Tables.read(s, dir, "embeddings")

    def mmr(i: Int): Config = {
      val k = 2 + rnd.nextInt(7)
      val lam = Vector(0, 1, 1000, 999, rnd.nextInt(1001))(rnd.nextInt(5))
      Config(f"fz$i%02d_mmr_k${k}_l$lam",
        (s, dir) => {
          val e = emb(s, dir)
          val query = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
          graft.ops.Mmr.select(e.filter(col("vec_id") =!= 0),
            col("vec_id"), col("embedding"), query, k, lam)
        },
        graft.ops.Mmr.selectSql(k, lam))
    }

    def mmrTopn(i: Int): Config = {
      val k = 2 + rnd.nextInt(6)
      val lam = 100 + rnd.nextInt(900)
      val candN = k + rnd.nextInt(60)
      Config(f"fz$i%02d_mmrtopn_k${k}_l${lam}_c$candN",
        (s, dir) => {
          val e = emb(s, dir)
          val query = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
          graft.ops.Mmr.selectPrefiltered(e.filter(col("vec_id") =!= 0),
            col("vec_id"), col("embedding"), query, k, lam, candN)
        },
        graft.ops.Mmr.selectPrefilteredSql(k, lam, candN))
    }

    def topNgrams(i: Int): Config = {
      val nn = 1 + rnd.nextInt(4)
      val k = 1 + rnd.nextInt(40)
      Config(f"fz$i%02d_ngrams_n${nn}_k$k",
        (s, dir) => graft.ops.NgramStats.topNgrams(
          Tables.read(s, dir, "documents"), col("text"), nn, k),
        graft.ops.NgramStats.topNgramsSql(nn, k))
    }

    def centroids(i: Int): Config = {
      val scale = Vector(7L, 10L, 100L, 1000L, 10000L)(rnd.nextInt(5))
      Config(f"fz$i%02d_centroids_s$scale",
        (s, dir) => graft.ops.EmbeddingPool.groupCentroids(emb(s, dir),
            col("label"), col("embedding"), dim = 64, scale = scale)
          .orderBy(col("group")),
        graft.ops.EmbeddingPool.groupCentroidsSql(dim = 64, scale = scale))
    }

    def paragraph(i: Int): Config = {
      // twin-side-only parameter: results must be SHARD-INVARIANT
      val shards = 1 + rnd.nextInt(6)
      Config(f"fz$i%02d_paradedup_sh$shards",
        SparkEntry.queries("q_paragraph_dedup"),
        graft.queries.DedupQueries.paragraphDedupOracle(shards))
    }

    def bitext(i: Int): Config = {
      val k = 1 + rnd.nextInt(6)
      val margin = 1000L + 100L * rnd.nextInt(11)
      Config(f"fz$i%02d_bitext_k${k}_m$margin",
        (s, dir) => {
          val e = emb(s, dir)
          val src = e.filter(pmod(col("vec_id"), lit(2L)) === 0)
          val tgt = e.filter(pmod(col("vec_id"), lit(2L)) === 1)
          graft.ops.BitextMining.minePairs(src, col("vec_id"), col("embedding"),
              tgt, col("vec_id"), col("embedding"), k, margin)
            .orderBy(col("src_id"))
        },
        s"""WITH ${graft.ops.BitextMining.minePairsSql(
               "vec_id % 2 = 0", "vec_id % 2 = 1", k, margin)}
           |SELECT src_id, tgt_id, cos_micro, margin_milli
           |FROM bmm ORDER BY src_id""".stripMargin)
    }

    def rankAgreement(i: Int): Config = {
      // synthetic arms: per query, two random rank lists over a doc
      // pool sized so the overlap is partial — identical literal rows
      // on both sides
      val k = 2 + rnd.nextInt(24)
      val p = 1 + rnd.nextInt(998)
      val rows: Seq[(Long, Seq[(Long, Long)], Seq[(Long, Long)])] =
        (0 until 3).map { q =>
          val pool = (0 until (k + 1 + rnd.nextInt(k))).map(_.toLong)
          def arm() = rnd.shuffle(pool).take(k)
            .zipWithIndex.map { case (d, r) => (d, (r + 1).toLong) }
          (q.toLong, arm(), arm())
        }
      def values(sel: ((Long, Seq[(Long, Long)], Seq[(Long, Long)])) => Seq[(Long, Long)]) =
        rows.flatMap { t => sel(t).map { case (d, r) => s"(${t._1}, $d, $r)" } }
          .mkString(", ")
      Config(f"fz$i%02d_rankagr_k${k}_p$p",
        (s, dir) => {
          import s.implicits._
          val a = rows.flatMap(t => t._2.map { case (d, r) => (t._1, d, r) })
            .toDF("query_id", "doc_id", "rank")
          val b = rows.flatMap(t => t._3.map { case (d, r) => (t._1, d, r) })
            .toDF("query_id", "doc_id", "rank")
          graft.ops.RankAgreement.agreement(a, b, k, p).orderBy(col("query_id"))
        },
        s"""WITH rla(query_id, doc_id, rank) AS (VALUES ${values(_._2)}),
           |rlb(query_id, doc_id, rank) AS (VALUES ${values(_._3)}),
           |${graft.ops.RankAgreement.agreementSqlTail(k, p)}
           |SELECT query_id, n_common, overlap_k_milli, tau_milli, rbo_micro
           |FROM ragr ORDER BY query_id""".stripMargin)
    }

    def pq(i: Int): Config = {
      val dim = 64
      val m = Vector(2, 4, 8, 16)(rnd.nextInt(4))
      val kc = Vector(2, 4, 8)(rnd.nextInt(3))
      val iters = 1 + rnd.nextInt(3)
      val topK = Vector(5, 10, 20)(rnd.nextInt(3))
      Config(f"fz$i%02d_pq_m${m}_k${kc}_i${iters}_t$topK",
        (s, dir) => {
          val e = emb(s, dir)
          val corpus = e.filter(col("vec_id") =!= 0L)
          val cb = graft.ops.PqIndex.fitCodebooks(corpus, col("vec_id"),
            col("embedding"), dim = dim, m = m, k = kc, iters = iters)
          val codes = graft.ops.PqIndex.encode(corpus, col("vec_id"),
            col("embedding"), cb)
          val qv = e.filter(col("vec_id") === 0L)
            .select(col("embedding").cast("array<double>"))
            .head().getSeq[Double](0).toArray
          graft.ops.PqIndex.adcTopK(codes, qv, cb, topK)
            .orderBy(col("adc_dist"), col("vec_id"))
        },
        graft.ops.PqIndex.pqSql(dim, m, kc, iters, topK))
    }

    def winnow(i: Int): Config = {
      val k = 2 + rnd.nextInt(3)
      val w = 1 + rnd.nextInt(6)
      val maxDf = 2 + rnd.nextInt(12)
      val minShared = 1 + rnd.nextInt(3)
      Config(f"fz$i%02d_winnow_k${k}_w${w}_d${maxDf}_s$minShared",
        (s, dir) => graft.ops.Winnowing.candidatePairs(
            graft.queries.TextQueries.docsWithPlantedDups(s, dir),
            col("doc_id"), col("text"), k, w, maxDf, minShared)
          .orderBy(col("id_a"), col("id_b")),
        s"""WITH ${graft.queries.TextQueries.allDocsCte},
           |${graft.ops.Winnowing.candidatePairsSql(k, w, maxDf, minShared)}
           |SELECT id_a, id_b, n_shared FROM wpr ORDER BY id_a, id_b""".stripMargin)
    }

    def pca(i: Int): Config = {
      val iters = 1 + rnd.nextInt(4)
      Config(f"fz$i%02d_pca_i$iters",
        (s, dir) => graft.ops.Pca.topComponent(emb(s, dir), col("embedding"),
            dim = 64, iters = iters)
          .orderBy(col("d")),
        s"""WITH ${graft.ops.Pca.topComponentSql(dim = 64, iters = iters)}
           |SELECT d, mu_q, pc1_e4 FROM pfin ORDER BY d""".stripMargin)
    }

    def luhn(i: Int): Config = {
      val minLen = 8 + rnd.nextInt(9)              // 8..16
      val maxLen = minLen + rnd.nextInt(20 - minLen) // minLen..19
      Config(f"fz$i%02d_luhn_l${minLen}_u$maxLen",
        (s, dir) => {
          val planted = concat(col("text"),
            when(col("doc_id") % 50 === 0, lit(" 4111111111111111")).otherwise(lit("")),
            when(col("doc_id") % 70 === 0, lit(" 4111111111111112")).otherwise(lit("")))
          graft.ops.TextCleaner.luhnPanAudit(Tables.read(s, dir, "documents"),
              col("doc_id"), planted, minLen, maxLen)
            .orderBy(col("doc_id"))
        },
        s"""WITH pana AS (SELECT doc_id,
           |                text ||
           |                  CASE WHEN doc_id % 50 = 0
           |                       THEN ' 4111111111111111' ELSE '' END ||
           |                  CASE WHEN doc_id % 70 = 0
           |                       THEN ' 4111111111111112' ELSE '' END AS t
           |              FROM documents),
           |${graft.ops.TextCleaner.luhnPanAuditSqlTail(minLen, maxLen)}
           |SELECT doc_id, n_pan_candidates, n_pan_valid, has_valid_pan,
           |  first_pan_masked
           |FROM panr ORDER BY doc_id""".stripMargin)
    }

    def pagerankShards(i: Int): Config = {
      // twin-side-only parameter: results must be SHARD-INVARIANT
      val shards = 1 + rnd.nextInt(6)
      Config(f"fz$i%02d_pagerank_sh$shards",
        SparkEntry.queries("q_pagerank"),
        graft.queries.CorpusQueries.pagerankOracle(shards))
    }

    def spanRemovalShards(i: Int): Config = {
      val shards = 1 + rnd.nextInt(6)
      Config(f"fz$i%02d_spanrm_sh$shards",
        SparkEntry.queries("q_dup_span_removal"),
        graft.queries.CorpusQueries.dupSpanRemovalOracle(shards))
    }

    val families: Vector[Int => Config] = Vector(
      mmr, topNgrams, rankAgreement, centroids, paragraph, bitext, mmrTopn, pq,
      winnow, pca, luhn, pagerankShards, spanRemovalShards)
    (0 until n).map(i => families(i % families.size)(i))
  }

  /** Dump `n` seeded configs in the Verify layout (parquet per config
    * + oracle_sql.json) for scripts/selfcheck.py.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      seed: Long, n: Int): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    val cfgs = configs(seed, n)
    val failed = cfgs.flatMap { c =>
      try {
        c.build(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/${c.name}")
        None
      } catch {
        case e: Throwable =>
          System.err.println(s"[fuzz] ${c.name} failed: ${e.getMessage}")
          Some(c.name)
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = cfgs.map(c => s"${q(c.name)}: ${q(c.sql)}").mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    failed
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val seed = if (args.length > 2) args(2).toLong else 12L
    val n = if (args.length > 3) args(3).toInt else 24
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.getOrCreate(s"local[$cpus]", cpus)
    val failed = run(spark, sfDir, outDir, seed, n)
    graft.util.PlanCache.clear(spark)
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[fuzz] ${failed.size} configs failed to build")
      sys.exit(3)
    }
  }
}
