package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram fingerprint (the WIMBD "what is in my big data?"
  * staple): the k most frequent word n-grams WITH multiplicity and
  * their corpus share — the fastest way to spot boilerplate
  * headers/footers, licence blocks, and template spam that per-doc
  * quality scores miss because every instance looks individually
  * fine.
  *
  * Scale shape: grams stay in-row (one transform over the token
  * array, no per-position shuffle rows until the single explode →
  * partial-agg count); the total is a 1-row scalar broadcast; the
  * top-k is TakeOrdered (per-partition heads merged on the driver),
  * never a global sort. Ties break lexically, so the cut is a total
  * order and bit-stable.
  */
object NgramStats {

  /** (gram, n, share_micro): top `k` n-grams by occurrence count
    * (desc, gram asc), share in millionths of all gram occurrences.
    * Documents shorter than `n` tokens contribute their whole text
    * as one gram (the C2 shingle convention).
    */
  def topNgrams(
      df: DataFrame,
      text: Column,
      n: Int,
      k: Int): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be positive")
    val toks = split(trim(lower(text)), "\\s+")
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
    val counts = df.select(explode(grams).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("gram"), col("n"),
        expr("n * 1000000 div __total").as("share_micro"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)
  }

  /** DuckDB twin over `documents(text)`. */
  def topNgramsSql(n: Int, k: Int): String = {
    val gram = (0 until n).map(j => s"toks[i${if (j == 0) "" else s" + $j"}]")
      .mkString(" || ' ' || ")
    s"""WITH tk AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS toks
       |            FROM documents),
       |gr AS (SELECT CASE WHEN len(toks) >= $n
       |         THEN list_transform(range(1, len(toks) - ${n - 1} + 1), i -> $gram)
       |         ELSE [array_to_string(toks, ' ')] END AS grams
       |       FROM tk),
       |fl AS (SELECT u.g AS gram FROM gr, unnest(grams) AS u(g)),
       |ct AS (SELECT gram, count(*) AS n FROM fl GROUP BY gram),
       |tt AS (SELECT sum(n) AS total FROM ct)
       |SELECT gram, CAST(n AS BIGINT) AS n,
       |  CAST(n * 1000000 // total AS BIGINT) AS share_micro
       |FROM ct CROSS JOIN tt
       |ORDER BY n DESC, gram LIMIT $k""".stripMargin
  }
}
