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
