package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text scrubbing / normalization for training-data preparation —
  * pure regexp/column expressions with DuckDB-expressible semantics
  * (each op's SQL twin is generated from the same pattern constants).
  */
object TextCleaner {

  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val HtmlTagPattern = "<[^>]+>"

  /** Replace URLs with a placeholder token. */
  def scrubUrls(text: Column, repl: String = "<URL>"): Column =
    regexp_replace(text, UrlPattern, repl)

  /** Replace email addresses (cheap PII pass). */
  def scrubEmails(text: Column, repl: String = "<EMAIL>"): Column =
    regexp_replace(text, EmailPattern, repl)

  /** Strip HTML/XML tags. */
  def stripHtml(text: Column): Column =
    regexp_replace(text, HtmlTagPattern, "")

  /** Collapse whitespace runs and trim. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** The full scrub pipeline (URL → email → tags → whitespace). */
  def scrubAll(text: Column): Column =
    normalizeWhitespace(stripHtml(scrubEmails(scrubUrls(text))))

  /** DuckDB twin of [[scrubAll]] over a column reference. */
  def scrubAllSql(text: String): String =
    s"trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"$text, 'https?://[^\\s]+', '<URL>', 'g'), " +
      s"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
      s"'<[^>]+>', '', 'g'), '\\s+', ' ', 'g'))"

  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val DigitRunPattern = "[0-9]{7,}"

  /** PII/pattern audit: per-doc match counts for the scrub patterns
    * plus IPv4s and long digit runs (phone/SSN/account-number
    * proxies), and an any-hit flag. Pure regexp_count expressions —
    * a zero-shuffle narrow map, integer-exact cross-engine. The
    * audit pass that decides WHAT to scrub before [[scrubAll]] does.
    */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    val counts = Seq(
      "n_urls" -> UrlPattern,
      "n_emails" -> EmailPattern,
      "n_ipv4" -> Ipv4Pattern,
      "n_digit_runs" -> DigitRunPattern)
      .map { case (name, p) => name -> regexp_count(text, lit(p)).cast("bigint") }
    counts :+ ("has_pii" ->
      counts.map(_._2).reduce(_ + _).gt(lit(0)).cast("int"))
  }

  /** Candidate primary-account-number runs: maximal contiguous digit
    * runs of 13–19 digits (the ISO/IEC 7812 length range). Extraction
    * takes WHOLE runs then filters by length — a bare {13,19} regex
    * would clip the first 19 digits out of a longer run (and RE2, the
    * DuckDB engine, has no lookbehind to anchor with).
    */
  val DigitRunAllPattern = "[0-9]+"

  /** Luhn mod-10 checksum over a digit-string column — pure HOF
    * integer arithmetic (reverse → double every second digit →
    * subtract 9 past 9 → sum % 10), identical in the DuckDB twin.
    */
  def luhnOk(c: Column): Column = {
    val rev = reverse(c)
    val sum = aggregate(sequence(lit(1), length(c)), lit(0L), (acc, i) => {
      val d = (ascii(rev.substr(i, lit(1))) - lit(48)).cast("long")
      val add = when(pmod(i, lit(2)) === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      acc + add
    })
    pmod(sum, lit(10L)) === 0L
  }

  /** Luhn-VALIDATED PAN audit (C137): the checksum layer C32's raw
    * digit-run counts lack — a random 16-digit run passes the length
    * test ~always but Luhn only 1 time in 10, so validation is what
    * separates "document contains a number" from "document leaks a
    * card number". Per doc: candidate count, Luhn-valid count, an
    * any-valid flag, and the first valid PAN masked to its last four
    * (the redaction preview). Zero-shuffle narrow map; every step is
    * exact integer/string arithmetic cross-engine.
    */
  def luhnPanAudit(df: org.apache.spark.sql.DataFrame,
      id: Column, text: Column,
      minLen: Int = 13, maxLen: Int = 19): org.apache.spark.sql.DataFrame =
    df.select(id.as("doc_id"), text.as("__t"))
      .withColumn("__cands",
        filter(regexp_extract_all(col("__t"), lit(DigitRunAllPattern), lit(0)),
          c => length(c).between(minLen, maxLen)))
      .withColumn("__valid", filter(col("__cands"), c => luhnOk(c)))
      .select(col("doc_id"),
        size(col("__cands")).cast("bigint").as("n_pan_candidates"),
        size(col("__valid")).cast("bigint").as("n_pan_valid"),
        (size(col("__valid")) > 0).cast("int").as("has_valid_pan"),
        expr("""CASE WHEN size(__valid) > 0 THEN
                  concat(repeat('*', length(element_at(__valid, 1)) - 4),
                         substr(element_at(__valid, 1),
                                length(element_at(__valid, 1)) - 3, 4))
                END""").as("first_pan_masked"))

  /** DuckDB twin of [[luhnPanAudit]]: expects a relation
    * `pana(doc_id, t)` in scope; final relation `panr`.
    */
  def luhnPanAuditSqlTail: String = luhnPanAuditSqlTail(13, 19)

  def luhnPanAuditSqlTail(minLen: Int, maxLen: Int): String = {
    val digit = "ascii(substr(reverse(c), CAST(i AS INT), 1)) - 48"
    s"""pnc AS (SELECT doc_id,
       |          list_filter(regexp_extract_all(t, '$DigitRunAllPattern'),
       |                      c -> length(c) BETWEEN $minLen AND $maxLen) AS cands
       |        FROM pana),
       |pnv AS (SELECT doc_id, cands,
       |          list_filter(cands, c ->
       |            (list_aggregate(list_transform(range(1, length(c) + 1), i ->
       |               CASE WHEN i % 2 = 0 THEN
       |                 CASE WHEN 2 * ($digit) > 9
       |                      THEN 2 * ($digit) - 9
       |                      ELSE 2 * ($digit) END
       |               ELSE $digit END), 'sum') % 10 = 0)) AS valid
       |        FROM pnc),
       |panr AS (SELECT doc_id,
       |           CAST(len(cands) AS BIGINT) AS n_pan_candidates,
       |           CAST(len(valid) AS BIGINT) AS n_pan_valid,
       |           CAST(CASE WHEN len(valid) > 0 THEN 1 ELSE 0 END AS INTEGER)
       |             AS has_valid_pan,
       |           CASE WHEN len(valid) > 0 THEN
       |             repeat('*', length(valid[1]) - 4) ||
       |               substr(valid[1], length(valid[1]) - 3, 4)
       |           END AS first_pan_masked
       |         FROM pnv)""".stripMargin
  }

  /** DuckDB twin of [[piiCounts]] as (alias, expression) pairs. */
  def piiCountsSql(text: String): Seq[(String, String)] = {
    val patterns = Seq(
      "n_urls" -> "https?://[^\\s]+",
      "n_emails" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "n_ipv4" -> "([0-9]{1,3}\\.){3}[0-9]{1,3}",
      "n_digit_runs" -> "[0-9]{7,}")
    val counts = patterns.map { case (name, p) =>
      name -> s"len(regexp_extract_all($text, '$p'))" }
    counts :+ ("has_pii" ->
      s"CAST(CASE WHEN ${counts.map(_._2).mkString(" + ")} > 0 THEN 1 ELSE 0 END AS INTEGER)")
  }
}
