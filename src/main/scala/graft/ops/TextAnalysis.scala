package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, as pure
  * column expressions (codegen-friendly, no UDFs): token counting,
  * quality flags, language ID, fingerprinting.
  *
  * Each operator has a DuckDB-SQL twin generated from the same
  * definition so the oracle is parity-by-construction.
  */
object TextAnalysis {

  /** Whitespace token count: number of \s+-separated tokens of the
    * trimmed text. (Both Spark `split` and DuckDB `string_split_regex`
    * return a single empty token for empty input — count 1; callers
    * wanting 0-for-empty can guard on length.)
    */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("bigint")

  def tokenCountSql(text: String): String =
    s"length(string_split_regex(trim($text), '\\s+'))"

  /** BPE-ish token count: alphabetic runs count 1, digits count 1
    * each, any other non-space symbol counts 1 — a cheap proxy for
    * subword tokenizers' behavior on numbers/punctuation.
    */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePattern)).cast("bigint")

  def bpeTokenCountSql(text: String): String =
    s"length(regexp_extract_all($text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))"

  /** Count of sentence-punctuation characters. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("bigint")

  def punctCountSql(text: String): String =
    s"length($text) - length(regexp_replace($text, '[.,!?;:]', '', 'g'))"

  /** Stopword hit count: number of words from `words` present in the
    * space-padded lowercased text.
    */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    words.map(w => when(padded.like(s"% $w %"), 1).otherwise(0))
      .reduce(_ + _).cast("bigint")
  }

  def stopwordHitsSql(text: String, words: Seq[String]): String =
    words.map(w => s"CASE WHEN ' ' || lower($text) || ' ' LIKE '% $w %' THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  /** Stopword lists per language for the heuristic language ID.
    * Picked for mutual exclusivity; tie-break order = list order.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "with", "from"),
    "de" -> Seq("der", "und", "von", "mit", "aus"),
    "fr" -> Seq("le", "et", "de", "avec", "dans"),
    "es" -> Seq("el", "y", "de", "con", "desde"))

  /** Heuristic language ID: argmax of stopword hits (>=1 hit required,
    * ties resolved by list order), else 'und'. Pure CASE cascade —
    * identical logic emitted for the DuckDB oracle by [[langIdSql]].
    */
  def langId(text: Column): Column = {
    val hits = LangStopwords.map { case (lang, ws) => lang -> stopwordHits(text, ws) }
    // lang wins if its hits >= 1 and strictly greater than every
    // earlier lang's hits and >= every later lang's hits
    hits.zipWithIndex.foldRight(lit("und")) { case (((lang, h), i), elseCol) =>
      val earlier = hits.take(i).map(_._2)
      val later = hits.drop(i + 1).map(_._2)
      val cond = (h >= 1) &&
        earlier.map(e => h > e).foldLeft(lit(true))(_ && _) &&
        later.map(l => h >= l).foldLeft(lit(true))(_ && _)
      when(cond, lit(lang)).otherwise(elseCol)
    }
  }

  def langIdSql(text: String): String = {
    val hits = LangStopwords.map { case (lang, ws) => lang -> stopwordHitsSql(text, ws) }
    val cases = hits.zipWithIndex.map { case ((lang, h), i) =>
      val earlier = hits.take(i).map { case (_, e) => s"$h > $e" }
      val later = hits.drop(i + 1).map { case (_, l) => s"$h >= $l" }
      val conds = Seq(s"$h >= 1") ++ earlier ++ later
      s"WHEN ${conds.mkString(" AND ")} THEN '$lang'"
    }
    s"CASE ${cases.mkString(" ")} ELSE 'und' END"
  }

  /** Quality flags (integer arithmetic only — oracle-exact):
    * length in range, enough tokens, not all punctuation.
    */
  def qualityFlags(text: Column): (Column, Column, Column) = {
    val lenOk = when(length(text).between(100, 20000), 1).otherwise(0).cast("bigint")
    val tokOk = when(tokenCount(text) >= 20, 1).otherwise(0).cast("bigint")
    val punctOk = when(punctCount(text) * 10 <= length(text), 1).otherwise(0).cast("bigint")
    (lenOk, tokOk, punctOk)
  }

  /** Content fingerprint: md5 hex of the raw text (exact dedup key,
    * identical in DuckDB).
    */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** 64-bit shingle fingerprint: min xxhash64 over word 3-grams —
    * a cheap locality-ish doc signature (not DuckDB-expressible;
    * spec-verified).
    */
  def shingleFingerprint(text: Column, k: Int = 3): Column = {
    val shingles = wordShingles(text, k)
    array_min(transform(shingles, s => xxhash64(s)))
  }

  /** Distinct word k-grams of the text as an array column — backed by
    * the single-pass [[graft.plans.WordShinglesExpr]] kernel.
    */
  def wordShingles(text: Column, k: Int): Column =
    graft.plans.WordShinglesExpr.shingles(text, k)

  /** Higher-order-function formulation of the same shingling (kept as
    * the semantic baseline the native kernel is verified against).
    */
  def wordShinglesHof(text: Column, k: Int): Column = {
    val tokens = split(trim(lower(text)), "\\s+")
    val n = size(tokens)
    val starts = sequence(lit(1), greatest(n - (k - 1), lit(1)))
    array_distinct(
      when(n >= k, transform(starts, i => concat_ws(" ", slice(tokens, i, lit(k)))))
        .otherwise(array(concat_ws(" ", tokens))))
  }

  /** Per-(doc, term) token frequency over lowercased whitespace
    * tokens: the atom of vocabulary analysis. One explode + one
    * count; shuffle key is (doc_id, term).
    */
  def termFrequencies(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.cast("bigint").as("doc_id"),
        explode(graft.plans.TermCountsExpr.termCounts(text)).as(Seq("term", "tf")))

  /** The explode + hash-aggregate formulation of [[termFrequencies]]
    * — semantically identical (spec-proven), kept as the parity
    * baseline. The kernel path computes the per-doc counts inside the
    * row (a document's tokens all live in one row), so it needs no
    * aggregation at all; this one materializes the full corpus token
    * stream through an exchangeless partial agg first.
    */
  def termFrequenciesExplode(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.cast("bigint").as("doc_id"),
        explode(split(trim(lower(text)), "\\s+")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Per-doc top-N terms by (tf desc, term asc) with each term's
    * document frequency attached — keyword-extraction statistics with
    * INTEGER-ONLY outputs (no engine-dependent log/float in sight, so
    * the whole operator is exactly oracle-checkable).
    */
  def topTermsPerDoc(df: DataFrame, id: Column, text: Column, topN: Int): DataFrame = {
    val tf = termFrequencies(df, id, text)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("term"))
    tf.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= topN)
      .join(dfreq, "term")
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rk"))
  }

  /** Corpus vocabulary: top-N terms by document frequency (ties by
    * term), with total occurrence counts.
    */
  def vocabulary(df: DataFrame, id: Column, text: Column, topN: Int): DataFrame =
    termFrequencies(df, id, text)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
      .orderBy(col("df").desc, col("term"))
      .limit(topN)

  /** Per-doc repetition metrics (Gopher-style quality rules): token
    * and bigram repetition per row — a NARROW map with zero shuffle,
    * the cheapest possible shape for a 100 TB quality pass. Backed by
    * the single-pass O(len) [[graft.plans.RepetitionExpr]] kernel
    * (see there for why the HOF formulation is a scale trap).
    * Returns columns (n_tokens, n_distinct_tokens, dup_token_frac,
    * n_bigrams, max_bigram_count, top_bigram_frac); fractions
    * rounded to 4dp.
    */
  def repetitionMetrics(text: Column): Seq[(String, Column)] = {
    val m = graft.plans.RepetitionExpr.stats(text)
    val n = m.getField("n_tokens")
    val nDistinct = m.getField("n_distinct_tokens")
    val nBigrams = m.getField("n_bigrams")
    val maxBigram = m.getField("max_bigram_count")
    Seq(
      "n_tokens" -> n,
      "n_distinct_tokens" -> nDistinct,
      "dup_token_frac" ->
        when(n > 0, round(lit(1.0) - nDistinct.cast("double") / n, 4)).otherwise(lit(0.0)),
      "n_bigrams" -> nBigrams,
      "max_bigram_count" -> maxBigram,
      "top_bigram_frac" ->
        when(nBigrams > 0, round(maxBigram.cast("double") / nBigrams, 4)).otherwise(lit(0.0)))
  }

  /** HOF formulation of the repetition statistics — the semantic
    * baseline the native kernel is verified against. O(len²) per row
    * and NOT safe outside codegen (captured-subtree re-evaluation;
    * see [[graft.plans.RepetitionExpr]]) — baseline/spec use only.
    */
  def repetitionMetricsHof(text: Column): Seq[(String, Column)] = {
    val toks = split(trim(lower(text)), "\\s+")
    val n = size(toks).cast("bigint")
    val nDistinct = size(array_distinct(toks)).cast("bigint")
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val nBigrams = size(bigrams).cast("bigint")
    val maxBigram = coalesce(
      array_max(transform(array_distinct(bigrams),
        x => size(filter(bigrams, y => y === x)))).cast("bigint"),
      lit(0L))
    Seq(
      "n_tokens" -> n,
      "n_distinct_tokens" -> nDistinct,
      "n_bigrams" -> nBigrams,
      "max_bigram_count" -> maxBigram)
  }
}
