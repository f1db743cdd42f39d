package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-candidate scoring — the inner statistic of tokenizer
  * vocabulary induction: over a corpus, count every adjacent
  * character pair inside every word occurrence; the highest-count
  * pair is the next BPE merge. Real BPE training repeats this after
  * each merge; one round over the raw corpus is the dominant cost
  * and the part worth distributing (later rounds run on the shrunken
  * word-frequency table).
  *
  * Scale shape: tokenize + pair-explode is narrow; the corpus is
  * first collapsed to a (word, count) frequency table (one
  * partial-agg shuffle on the word — at 100 TB the distinct-word
  * table is orders of magnitude smaller than the token stream), then
  * pairs explode from DISTINCT words weighted by count and
  * partial-agg on the 2-char pair key. Top-k is
  * TakeOrderedAndProject — no global sort.
  */
object BpePairs {

  /** Top-`k` adjacent character pairs by weighted occurrence count:
    * (pair, n_positions, n_total) where n_positions counts the
    * pair's positions across DISTINCT words and n_total weights each
    * position by its word's corpus frequency (the true BPE merge
    * score). Ordered by n_total desc, pair asc.
    */
  def topPairs(df: DataFrame, text: Column, k: Int): DataFrame = {
    val words = df
      .select(explode(split(trim(lower(text)), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))

    words
      .select(col("wc"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_positions"), sum(col("wc")).as("n_total"))
      .orderBy(col("n_total").desc, col("pair"))
      .limit(k)
  }

  /** DuckDB twin of [[topPairs]] over `table(text)`. */
  def topPairsSql(table: String, k: Int): String =
    s"""SELECT pair,
       |  count(*) AS n_positions,
       |  CAST(sum(wc) AS BIGINT) AS n_total
       |FROM (
       |  SELECT wc, substr(word, CAST(p.i AS INT), 2) AS pair
       |  FROM (
       |    SELECT u.word AS word, count(*) AS wc
       |    FROM $table, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(word)
       |    WHERE len(u.word) >= 2
       |    GROUP BY u.word),
       |  unnest(range(1, len(word))) AS p(i))
       |GROUP BY pair
       |ORDER BY n_total DESC, pair
       |LIMIT $k""".stripMargin
}
