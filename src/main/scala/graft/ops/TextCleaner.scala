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
}
