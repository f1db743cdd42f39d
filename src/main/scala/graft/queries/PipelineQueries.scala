package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Bm25, Contamination, FuzzyJoin, RangeJoin, Resample, Sampling, TextAnalysis, TextCleaner, ZOrder}

/** Round-4 capability queries: relational widening (cube, fuzzy join,
  * range join, z-order) and training-data analytics (contamination,
  * repetition metrics, BM25 retrieval). Oracle rules per SURVEY §4.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** (query_id, term) literals for the BM25 query. Lowercase terms
    * drawn from the synthetic documents' vocabulary.
    */
  val Bm25Queries: Seq[(String, String)] = Seq(
    "q1" -> "spark", "q1" -> "table",
    "q2" -> "hash", "q2" -> "merge",
    "q3" -> "window", "q3" -> "sort")

  val EvalFraction = 0.05

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A32: cube lattice — all subtotal combinations of two dims.
    "q_cube" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("iso_dow", (weekday(col("ts")) + 1).cast("bigint"))
        .cube(col("event_type"), col("iso_dow"))
        .agg(
          (grouping(col("event_type")) * 2 + grouping(col("iso_dow"))).cast("int").as("gid"),
          count(lit(1)).as("n"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("iso_dow"), lit(-1L)).as("iso_dow"),
          col("gid"), col("n"), col("min_value"), col("max_value"))
        .orderBy(col("gid"), col("event_type"), col("iso_dow"))
    },

    // A34: blocked fuzzy self-join over distinct part names (block =
    // the noun, verify = bounded levenshtein).
    "q_fuzzy_join" -> { (s, dir) =>
      val names = t(s, dir, "part").select(col("p_name")).distinct()
      FuzzyJoin.selfJoin(names, col("p_name"), col("p_name"),
          split(col("p_name"), " ").getItem(1), maxDist = 3)
        .select(col("id_a"), col("id_b"), col("dist"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // A33: point-in-interval join — clicks landing inside 30-minute
    // windows opened by (a deterministic subset of) purchases.
    "q_range_join" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), unix_micros(col("ts")).as("click_us"))
      val halfHourUs = 1800000000L
      val windows = ev.filter(col("event_type") === "purchase" && col("event_id") % 20 === 0)
        .select(col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("start_us"),
          (unix_micros(col("ts")) + halfHourUs).as("end_us"))
      RangeJoin.pointInInterval(clicks, col("click_us"),
          windows, col("start_us"), col("end_us"), cellWidth = halfHourUs)
        .select(col("purchase_id"), col("click_id"))
        .orderBy(col("purchase_id"), col("click_id"))
    },

    // C29: benchmark contamination — 3-shingle overlap of every doc
    // against a hash-sampled "eval set" slice of the corpus.
    "q_contamination" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val eval = Sampling.hashSample(d, col("doc_id"), EvalFraction)
      Contamination.overlap(d, col("doc_id"), col("text"),
          eval, col("text"), shingleK = 3, minFrac = 0.5)
        .orderBy(col("doc_id"))
    },

    // C30: per-doc repetition metrics — a zero-shuffle narrow map.
    "q_repetition" -> { (s, dir) =>
      val metrics = TextAnalysis.repetitionMetrics(col("text"))
        .map { case (name, c) => c.as(name) }
      t(s, dir, "documents")
        .select(col("doc_id") +: metrics: _*)
        .orderBy(col("doc_id"))
    },

    // C31: BM25 top-10 per keyword query.
    "q_bm25" -> { (s, dir) =>
      import s.implicits._
      val queries = Bm25Queries.toDF("query_id", "term")
      Bm25.topK(t(s, dir, "documents"), col("doc_id"), col("text"), queries,
          k1 = 1.2, b = 0.75, topK = 10)
        .orderBy(col("query_id"), col("rk"))
    },

    // C32: PII/pattern audit — per-doc match counts, zero-shuffle.
    "q_pii_audit" -> { (s, dir) =>
      val cols = TextCleaner.piiCounts(col("text")).map { case (n, c) => c.as(n) }
      t(s, dir, "documents")
        .select(col("doc_id") +: cols: _*)
        .orderBy(col("doc_id"))
    },

    // C137: Luhn-validated PAN audit — planted construction: every
    // 50th doc carries a checksum-VALID test PAN, every 70th a
    // near-miss (same digits, last one off), so the audit must
    // separate them by arithmetic, not by pattern shape.
    "q_pan_audit" -> { (s, dir) =>
      val planted = concat(col("text"),
        when(col("doc_id") % 50 === 0, lit(" 4111111111111111")).otherwise(lit("")),
        when(col("doc_id") % 70 === 0, lit(" 4111111111111112")).otherwise(lit("")))
      TextCleaner.luhnPanAudit(t(s, dir, "documents"), col("doc_id"), planted)
        .orderBy(col("doc_id"))
    },

    // A36: per-key regular-grid resample with forward fill (daily
    // value-as-of per user over the events stream).
    "q_resample" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("value"), col("event_id"))
      Resample.resampleFfill(ev, "user_id", "us", "value", "event_id",
          stepUs = 86400000000L)
        .orderBy(col("user_id"), col("slot_us"))
    },

    // A37: trailing event-time window (1 h) per key — RANGE frame
    // over the microsecond axis, order-insensitive aggregates only.
    "q_rolling" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3599999999L, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
          col("value"))
        .select(col("event_id"), col("user_id"), col("us"),
          count(lit(1)).over(w).as("n_1h"),
          min(col("value")).over(w).as("min_1h"),
          max(col("value")).over(w).as("max_1h"))
        .orderBy(col("event_id"))
    },

    // C33: group-wise winsorization — clip to the [p05, p95]
    // interpolated percentiles of each event_type.
    "q_winsorize" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          expr("percentile(value, 0.05)").over(w).as("p05"),
          expr("percentile(value, 0.95)").over(w).as("p95"))
        .select(col("event_id"), col("event_type"),
          round(least(greatest(col("value"), col("p05")), col("p95")), 6).as("value_w"))
        .orderBy(col("event_id"))
    },

    // A35: z-value computation (the layout write + pruning effect is
    // spec-covered; the curve arithmetic is oracled here).
    "q_zorder" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          col("user_id").bitwiseAND(lit(63L)).as("zx"),
          floor(col("value")).cast("bigint").bitwiseAND(lit(63L)).as("zy"),
          ZOrder.zValue2(col("user_id"), floor(col("value")), 6).as("zval"))
        .orderBy(col("event_id"))
    }
  )

  private[queries] val shinglesCteDocs =
    """tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |        FROM documents),
      |sh AS (SELECT doc_id,
      |         list_distinct(CASE WHEN len(toks) >= 3
      |           THEN list_transform(range(1, len(toks) - 1),
      |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |           ELSE [array_to_string(toks, ' ')] END) AS shingles
      |       FROM tok)""".stripMargin

  private[queries] val hash60: String => String =
    v => s"('0x' || substr(md5(CAST($v AS VARCHAR)), 1, 15))::BIGINT"

  private[queries] val evalThreshold: Long =
    (BigDecimal(EvalFraction) * BigDecimal(Sampling.HashSpace)).toLong

  val oracles: Map[String, String] = Map(
    "q_cube" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(isodow(ts), -1) AS iso_dow,
        |       CAST(grouping(event_type) * 2 + grouping(isodow(ts)) AS INT) AS gid,
        |       count(*) AS n, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY CUBE(event_type, isodow(ts))
        |ORDER BY gid, event_type, iso_dow""".stripMargin,

    "q_fuzzy_join" ->
      """WITH n AS (SELECT DISTINCT p_name, string_split(p_name, ' ')[2] AS noun FROM part)
        |SELECT a.p_name AS id_a, b.p_name AS id_b,
        |       levenshtein(a.p_name, b.p_name) AS dist
        |FROM n a JOIN n b ON a.noun = b.noun AND a.p_name < b.p_name
        |WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
        |  AND levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q_range_join" ->
      """WITH clicks AS (
        |  SELECT event_id AS click_id, epoch_us(ts) AS click_us
        |  FROM events WHERE event_type = 'click'),
        |w AS (
        |  SELECT event_id AS purchase_id, epoch_us(ts) AS start_us,
        |         epoch_us(ts) + 1800000000 AS end_us
        |  FROM events WHERE event_type = 'purchase' AND event_id % 20 = 0)
        |SELECT purchase_id, click_id
        |FROM w JOIN clicks ON click_us BETWEEN start_us AND end_us
        |ORDER BY purchase_id, click_id""".stripMargin,

    "q_contamination" ->
      s"""WITH $shinglesCteDocs,
         |vocab AS (SELECT DISTINCT ${hash60("u.s")} AS shash
         |          FROM sh, unnest(sh.shingles) AS u(s)
         |          WHERE ${hash60("sh.doc_id")} < $evalThreshold),
         |tot AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles FROM sh),
         |ex AS (SELECT sh.doc_id, ${hash60("u.s")} AS shash
         |       FROM sh, unnest(sh.shingles) AS u(s)),
         |hits AS (SELECT ex.doc_id, count(*) AS n_overlap
         |         FROM ex JOIN vocab USING (shash) GROUP BY ex.doc_id)
         |SELECT t.doc_id, t.n_shingles,
         |       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
         |       CASE WHEN t.n_shingles > 0
         |         THEN round(CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / t.n_shingles, 4)
         |         ELSE 0.0 END AS overlap_frac,
         |       CAST(CASE WHEN coalesce(h.n_overlap, 0) * 10000 >= 5000 * t.n_shingles
         |         THEN 1 ELSE 0 END AS INTEGER) AS contaminated
         |FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    "q_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        |             FROM documents),
        |bg AS (SELECT doc_id, toks,
        |         CASE WHEN len(toks) >= 2
        |           THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |           ELSE [] END AS bigrams
        |       FROM tok),
        |m AS (SELECT doc_id,
        |        CAST(len(toks) AS BIGINT) AS n_tokens,
        |        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
        |        CAST(len(bigrams) AS BIGINT) AS n_bigrams,
        |        CAST(coalesce(list_max(list_transform(list_distinct(bigrams),
        |          x -> len(list_filter(bigrams, y -> y = x)))), 0) AS BIGINT) AS max_bigram_count
        |      FROM bg)
        |SELECT doc_id, n_tokens, n_distinct_tokens,
        |  CASE WHEN n_tokens > 0
        |    THEN round(1.0 - CAST(n_distinct_tokens AS DOUBLE) / n_tokens, 4)
        |    ELSE 0.0 END AS dup_token_frac,
        |  n_bigrams, max_bigram_count,
        |  CASE WHEN n_bigrams > 0
        |    THEN round(CAST(max_bigram_count AS DOUBLE) / n_bigrams, 4)
        |    ELSE 0.0 END AS top_bigram_frac
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_bm25" -> {
      val values = Bm25Queries.map { case (q, tm) => s"('$q', '$tm')" }.mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $values),
         |toks AS (SELECT doc_id, u.term
         |         FROM documents, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(term)),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |dl AS (SELECT doc_id, ${TextAnalysis.tokenCountSql("text")} AS dl FROM documents),
         |stats AS (SELECT count(*) AS n_docs,
         |                 avg(${TextAnalysis.tokenCountSql("text")}) AS avgdl
         |          FROM documents),
         |contrib AS (
         |  SELECT q.query_id, tf.doc_id,
         |         ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
         |           * tf.tf * 2.2
         |           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS part
         |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
         |       CROSS JOIN stats JOIN q ON q.term = tf.term),
         |scored AS (SELECT query_id, doc_id, round(sum(part), 4) AS score
         |           FROM contrib GROUP BY query_id, doc_id),
         |r AS (SELECT query_id, doc_id, score,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY score DESC, doc_id) AS BIGINT) AS rk
         |      FROM scored)
         |SELECT query_id, doc_id, score, rk FROM r WHERE rk <= 10
         |ORDER BY query_id, rk""".stripMargin
    },

    "q_rolling" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
        |  count(*) OVER w AS n_1h,
        |  min(value) OVER w AS min_1h,
        |  max(value) OVER w AS max_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_winsorize" ->
      """WITH p AS (
        |  SELECT event_id, event_type, value,
        |    quantile_cont(value, 0.05) OVER (PARTITION BY event_type) AS p05,
        |    quantile_cont(value, 0.95) OVER (PARTITION BY event_type) AS p95
        |  FROM events)
        |SELECT event_id, event_type,
        |  round(least(greatest(value, p05), p95), 6) AS value_w
        |FROM p ORDER BY event_id""".stripMargin,

    "q_pii_audit" -> {
      val exprs = TextCleaner.piiCountsSql("text")
        .map { case (n, e) => s"$e AS $n" }.mkString(",\n       ")
      s"""SELECT doc_id, $exprs
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_pan_audit" ->
      s"""WITH pana AS (SELECT doc_id,
         |                text ||
         |                  CASE WHEN doc_id % 50 = 0
         |                       THEN ' 4111111111111111' ELSE '' END ||
         |                  CASE WHEN doc_id % 70 = 0
         |                       THEN ' 4111111111111112' ELSE '' END AS t
         |              FROM documents),
         |${TextCleaner.luhnPanAuditSqlTail}
         |SELECT doc_id, n_pan_candidates, n_pan_valid, has_valid_pan,
         |  first_pan_masked
         |FROM panr ORDER BY doc_id""".stripMargin,

    "q_resample" ->
      """WITH obs AS (
        |  SELECT user_id, epoch_us(ts) AS obs_us, arg_max(value, event_id) AS obs_value
        |  FROM events GROUP BY user_id, epoch_us(ts)),
        |b AS (SELECT user_id,
        |        (min(obs_us) + 86399999999) // 86400000000 AS slot_lo,
        |        max(obs_us) // 86400000000 AS slot_hi
        |      FROM obs GROUP BY user_id),
        |grid AS (SELECT user_id, u.g * 86400000000 AS slot_us
        |         FROM b, unnest(generate_series(slot_lo, slot_hi)) AS u(g)),
        |f AS (SELECT g.user_id, g.slot_us, o.obs_value AS value
        |      FROM grid g ASOF LEFT JOIN obs o
        |        ON g.user_id = o.user_id AND o.obs_us <= g.slot_us)
        |SELECT user_id, slot_us, value FROM f ORDER BY user_id, slot_us""".stripMargin,

    "q_zorder" ->
      s"""SELECT event_id, (user_id & 63) AS zx,
         |       (CAST(floor(value) AS BIGINT) & 63) AS zy,
         |       ${ZOrder.zValue2Sql("user_id", "CAST(floor(value) AS BIGINT)", 6)} AS zval
         |FROM events ORDER BY event_id""".stripMargin
  )
}
