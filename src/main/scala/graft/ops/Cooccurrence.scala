package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Co-occurrence / PMI statistics — the distributional-semantics
  * prep step (word2vec windows, collocation mining, phrase
  * detection): count ordered token pairs within a short forward
  * window, attach unigram counts, and score each pair by pointwise
  * mutual information. High-PMI pairs are collocations ("new york");
  * the full table is the input to embedding trainers and to
  * phrase-merging tokenizers.
  *
  * Scale shape: one tokenize pass emits the (w1, w2) forward-window
  * pair stream (narrow positional self-zip — no self-join on
  * positions); pair counts and unigram counts are two partial-agg
  * shuffles on fixed-width keys; PMI attaches by key join (count
  * tables are data-derived vocabulary size, AQE broadcasts when
  * small). PMI is quantized to integer micro-nats from exact integer
  * counts, so results are engine-portable. Top-k by pair count via
  * TakeOrderedAndProject.
  */
object Cooccurrence {

  /** Top-`k` pairs by co-occurrence count with PMI:
    * (w1, w2, n_pair, pmi) where pairs are tokens at forward
    * distance 1..`window` and
    * pmi = ln(n_pairs_total · c12 / (c1 · c2)) rounded 4dp from a
    * micro-nat floor (c1/c2 count appearances in the PAIR STREAM as
    * left/right element, making the PMI table self-normalized).
    * Ordered n_pair desc, (w1, w2) asc.
    */
  def pmiPairs(df: DataFrame, text: Column, window: Int, k: Int): DataFrame = {
    require(window >= 1 && window <= 8)
    val toks = df.select(split(trim(lower(text)), "\\s+").as("toks"))

    val pairStream = toks.select(explode(flatten(
      transform(sequence(lit(1), lit(window)),
        d => zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - d, lit(0))),
          slice(col("toks"), d + 1, greatest(size(col("toks")) - d, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .sharedPersist()

    val pairs = pairStream.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
    val left = pairStream.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val right = pairStream.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
    val total = pairStream.agg(count(lit(1)).as("t"))

    pairs
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_pair"),
        round(
          floor(log(col("t").cast("double") * col("n_pair") / (col("c1") * col("c2"))) * 1e6)
            .cast("bigint").cast("double") / 1e6, 4).as("pmi"))
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** DuckDB twin of [[pmiPairs]] over `table(text)`. */
  def pmiPairsSql(table: String, window: Int, k: Int): String =
    s"""SELECT w1, w2, n_pair,
       |  round(CAST(CAST(floor(ln(CAST(t AS DOUBLE) * n_pair / (c1 * c2)) * 1e6) AS BIGINT) AS DOUBLE) / 1e6, 4) AS pmi
       |FROM (
       |  SELECT w1, w2, count(*) AS n_pair FROM (
       |    SELECT toks[p.i] AS w1, toks[p.i + d.d] AS w2
       |    FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS toks FROM $table),
       |         unnest(range(1, $window + 1)) AS d(d),
       |         unnest(range(1, len(toks) + 1)) AS p(i)
       |    WHERE p.i + d.d <= len(toks))
       |  GROUP BY w1, w2) pp
       |JOIN (SELECT w1, count(*) AS c1 FROM (
       |    SELECT toks[p.i] AS w1
       |    FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS toks FROM $table),
       |         unnest(range(1, $window + 1)) AS d(d),
       |         unnest(range(1, len(toks) + 1)) AS p(i)
       |    WHERE p.i + d.d <= len(toks)) GROUP BY w1) l USING (w1)
       |JOIN (SELECT w2, count(*) AS c2 FROM (
       |    SELECT toks[p.i + d.d] AS w2
       |    FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS toks FROM $table),
       |         unnest(range(1, $window + 1)) AS d(d),
       |         unnest(range(1, len(toks) + 1)) AS p(i)
       |    WHERE p.i + d.d <= len(toks)) GROUP BY w2) r USING (w2)
       |CROSS JOIN (SELECT count(*) AS t FROM (
       |    SELECT 1
       |    FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS toks FROM $table),
       |         unnest(range(1, $window + 1)) AS d(d),
       |         unnest(range(1, len(toks) + 1)) AS p(i)
       |    WHERE p.i + d.d <= len(toks)))
       |ORDER BY n_pair DESC, w1, w2
       |LIMIT $k""".stripMargin
}
