package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing (C72): staged regex redaction of emails, IPv4
  * addresses, and long digit runs (ids / phone fragments / account
  * numbers), with per-document match counts — the masking pass every
  * web-scale training corpus runs before release (the C4/CCNet-style
  * hygiene step; the reference's cleaning steps are DuckDB
  * `regexp_replace` chains, e.g. its feed-text scrubbing).
  *
  * Scale shape: a pure narrow map — three `regexp_replace` + three
  * `regexp_extract_all` over the row it came from, all codegen'd
  * builtins, no shuffle, no state, no UDF. At 100 TB this runs at
  * scan speed and column-prunes to exactly (id, text).
  *
  * Determinism/portability: the three patterns are RE2-compatible
  * (no backreferences, no lookaround) and use only ASCII classes, so
  * the DuckDB twin `regexp_replace(x, pat, repl, 'g')` reproduces
  * them byte for byte. Stages apply in a fixed order — emails, then
  * IPs, then bare digit runs — and each stage counts on the PREVIOUS
  * stage's output, so a digit run inside an email is counted once as
  * email, never double-counted as a number (the replacement tokens
  * contain no digits by construction).
  */
object Scrub {

  /** RE2- and java.util.regex-compatible: no lookaround, ASCII classes. */
  final val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  final val Ipv4Pattern = """\b(\d{1,3}\.){3}\d{1,3}\b"""
  final val DigitRunPattern = """\d{4,}"""

  final val EmailToken = "<EMAIL>"
  final val IpToken = "<IP>"
  final val NumToken = "<NUM>"

  /** Redact `text`, returning one row per input row:
    * (id, clean, n_emails, n_ips, n_nums). Counts are per-stage match
    * counts (see class doc for the staging rule).
    */
  def redactPii(df: DataFrame, id: Column, text: Column): DataFrame = {
    val t0 = text
    val t1 = regexp_replace(t0, EmailPattern, EmailToken)
    val t2 = regexp_replace(t1, Ipv4Pattern, IpToken)
    val t3 = regexp_replace(t2, DigitRunPattern, NumToken)
    df.select(
      id.as("id"),
      t3.as("clean"),
      size(regexp_extract_all(t0, lit(EmailPattern), lit(0))).cast("bigint").as("n_emails"),
      size(regexp_extract_all(t1, lit(Ipv4Pattern), lit(0))).cast("bigint").as("n_ips"),
      size(regexp_extract_all(t2, lit(DigitRunPattern), lit(0))).cast("bigint").as("n_nums"))
  }

  /** DuckDB twin of [[redactPii]] over column expression `c` —
    * emits the five output columns as a SQL projection fragment.
    * DuckDB's `regexp_replace` is first-match-only by default, hence
    * the explicit 'g'.
    */
  def redactPiiSql(idCol: String, c: String): String = {
    val t1 = s"regexp_replace($c, '$EmailPattern', '$EmailToken', 'g')"
    val t2 = s"regexp_replace($t1, '$Ipv4Pattern', '$IpToken', 'g')"
    val t3 = s"regexp_replace($t2, '$DigitRunPattern', '$NumToken', 'g')"
    s"""$idCol AS id,
       |  $t3 AS clean,
       |  CAST(len(regexp_extract_all($c, '$EmailPattern')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all($t1, '$Ipv4Pattern')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all($t2, '$DigitRunPattern')) AS BIGINT) AS n_nums""".stripMargin
  }
}
