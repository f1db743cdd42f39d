package graft.ops

import graft.util.PlanCache.Shareable
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
    *
    * Two-phase threshold pruning so gram STRINGS never shuffle at
    * corpus width: phase 1 counts by 8-byte xxhash64 (fixed-width
    * shuffle) and takes the k-th largest count c_k; phase 2 re-scans,
    * keeps only occurrences whose gram-hash count ≥ c_k (a hash
    * semi-join against the tiny ≥-threshold hash set — collisions
    * only widen the candidate set, the string re-count is exact),
    * and counts those few strings exactly. A naive single-phase
    * groupBy(gram) shuffles every occurrence as text — measured 109 s
    * at sf10 (60 M-doc organic corpus) vs ~12 s for this shape.
    */
  def topNgrams(
      df: DataFrame,
      text: Column,
      n: Int,
      k: Int): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be positive")
    // codegen'd kernel, not the split->sequence->transform(concat_ws
    // (slice)) HOF chain: the interpreted lambda dominated the sf10
    // wall (the §5 r11 java-regex/HOF lesson applies to counting too)
    val grams = graft.plans.WordGramsExpr.grams(text, n)
    // NOT persisted: two cheap kernel scans beat materializing the
    // corpus-width gram strings
    val occ = df.select(explode(grams).as("gram"))

    // phase 1: fixed-width hash counts; total rides the same pass
    val hCounts = occ.select(xxhash64(col("gram")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("hn"))
      .sharedPersist()
    val total = hCounts.agg(sum(col("hn")).as("__total"))
    // k-th largest hash-count: a 1-row TakeOrdered decision. Any gram
    // in the true top-k has string-count <= its hash-count, and there
    // are >= k hashes with hash-count >= c_k, so the >= c_k hash set
    // is a superset of the top-k grams' hashes.
    val ckRow = hCounts.orderBy(col("hn").desc).limit(k)
      .agg(min(col("hn")).as("ck")).head(1)
    val ck = if (ckRow.isEmpty || ckRow(0).isNullAt(0)) 1L else ckRow(0).getLong(0)
    val candidates = hCounts.filter(col("hn") >= ck).select(col("h"))

    // The broadcast is only legal if the candidate set is actually
    // small. On a flat count distribution (c_k near 1 — a dedup'd or
    // boilerplate-free corpus) "hash count >= c_k" keeps essentially
    // EVERY distinct gram hash, and a forced broadcast of an unbounded
    // relation blows the 8 GB broadcast limit / driver heap at sf10+.
    // The prune buys nothing there anyway (it filters no occurrences),
    // so: count the candidates first (a cheap scan of the persisted
    // hash counts) and fall back to the plain string groupBy when the
    // set exceeds the broadcast budget (8M hashes ~ 64 MB of longs).
    val maxBroadcastCand = 8L * 1000 * 1000
    val nCand = candidates.limit((maxBroadcastCand + 1).toInt)
      .agg(count(lit(1)).as("c")).head(1)(0).getLong(0)
    val counts = if (ck <= 1L || nCand > maxBroadcastCand) {
      occ.groupBy(col("gram")).agg(count(lit(1)).as("n"))
    } else {
      // phase 2: only candidate occurrences shuffle as strings
      val exact = occ
        .join(broadcast(candidates), xxhash64(col("gram")) === col("h"), "left_semi")
        .groupBy(col("gram")).agg(count(lit(1)).as("n"))
        .sharedPersist()

      // soundness gate: every gram OUTSIDE the candidate set has string
      // count < c_k (its hash count is below the cut), so the pruned
      // result is exact iff >= k candidate grams re-count >= c_k. A
      // hash collision can merge two mid-count grams into a hash that
      // lifts c_k above the true k-th string count — vanishing odds at
      // 64 bits, but this 1-row check makes the prune EXACT, not
      // probabilistic: on a miss, fall back to the full string count.
      val sound = exact.filter(col("n") >= ck).limit(k)
        .agg(count(lit(1)).as("m")).head(1)(0).getLong(0) >= k
      if (sound) exact
      else occ.groupBy(col("gram")).agg(count(lit(1)).as("n"))
    }

    counts.crossJoin(broadcast(total))
      .select(col("gram"), col("n"),
        expr("n * 1000000 div __total").as("share_micro"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)
  }

  /** Per-source text predictability: conditional bigram entropy
    * H(w₂|w₁) = H(bigrams) − H(unigrams), in exact micro-nats (the
    * C42 floor(−p·ln p·1e6) device). Low H(w₂|w₁) relative to H(w₁)
    * = the next token is largely determined by the previous one —
    * template/boilerplate text that unigram entropy alone misses
    * (same vocabulary, rigid order). Two kernel-gram passes, each a
    * (source, gram)-keyed partial agg; everything after is
    * per-source rows.
    *
    * @return (source, n_tokens, n_bigrams, h_unigram_micro,
    *         h_bigram_micro, h_cond_micro)
    */
  def conditionalEntropy(
      df: DataFrame,
      source: Column,
      text: Column): DataFrame = {
    def entropy(k: Int, totalName: String, entName: String): DataFrame = {
      // persisted: the totals agg and the contribution join both read
      // this table — unpersisted, the gram-kernel corpus scan + count
      // shuffle ran twice per k (the sourceDrift defect); size is
      // bounded by |per-source k-gram vocab| fixed-width rows
      val counts = df.select(source.cast("string").as("source"),
          explode(graft.plans.WordGramsExpr.grams(text, k)).as("g"))
        .groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
        .sharedPersist()
      val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("ts"))
      val p = col("c").cast("double") / col("ts")
      counts.join(totals, Seq("source"))
        .select(col("source"), col("c"),
          floor(-p * log(p) * 1e6).cast("bigint").as("e"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as(totalName), sum(col("e")).as(entName))
    }
    entropy(1, "n_tokens", "h_unigram_micro")
      .join(entropy(2, "n_bigrams", "h_bigram_micro"), Seq("source"))
      .select(col("source"), col("n_tokens"), col("n_bigrams"),
        col("h_unigram_micro"), col("h_bigram_micro"),
        (col("h_bigram_micro") - col("h_unigram_micro")).as("h_cond_micro"))
  }

  /** DuckDB twin of [[conditionalEntropy]] over
    * `documents(source, text)`.
    */
  def conditionalEntropySql(): String = {
    def gramCase(n: Int): String = {
      val gram = (0 until n).map(j => s"toks[i${if (j == 0) "" else s" + $j"}]")
        .mkString(" || ' ' || ")
      s"""CASE WHEN len(toks) >= $n
         |          THEN list_transform(range(1, len(toks) - ${n - 1} + 1), i -> $gram)
         |          ELSE [array_to_string(toks, ' ')] END""".stripMargin
    }
    def chain(n: Int): String =
      s"""cg$n AS (SELECT source, u.g AS g
       |        FROM (SELECT source, ${gramCase(n)} AS grams FROM cet) x,
       |             unnest(grams) AS u(g)),
       |cc$n AS (SELECT source, g, count(*) AS c FROM cg$n GROUP BY 1, 2),
       |ct$n AS (SELECT source, sum(c) AS ts FROM cc$n GROUP BY 1),
       |ce$n AS (SELECT c.source, CAST(sum(c.c) AS BIGINT) AS tot,
       |          sum(CAST(floor(-(CAST(c.c AS DOUBLE) / t.ts)
       |              * ln(CAST(c.c AS DOUBLE) / t.ts) * 1e6) AS BIGINT)) AS ent
       |        FROM cc$n c JOIN ct$n t USING (source) GROUP BY c.source)""".stripMargin
    s"""WITH cet AS (SELECT CAST(source AS VARCHAR) AS source,
       |              string_split_regex(trim(lower(text)), '\\s+') AS toks
       |            FROM documents),
       |${chain(1)},
       |${chain(2)}
       |SELECT ce1.source, ce1.tot AS n_tokens, ce2.tot AS n_bigrams,
       |  CAST(ce1.ent AS BIGINT) AS h_unigram_micro,
       |  CAST(ce2.ent AS BIGINT) AS h_bigram_micro,
       |  CAST(ce2.ent - ce1.ent AS BIGINT) AS h_cond_micro
       |FROM ce1 JOIN ce2 USING (source)
       |ORDER BY ce1.source""".stripMargin
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
