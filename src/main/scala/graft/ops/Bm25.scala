package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the inverted-index
  * scoring shape, expressed as dataframe algebra.
  *
  * Scale shape: the term stream is exploded ONCE and immediately
  * filtered against the query vocabulary (pushed into the per-row
  * token filter as literals), so only postings for queried terms
  * survive past the scan — the shuffle that builds tf is keyed on
  * (doc, term) over that filtered stream, never the full corpus term
  * stream. The persisted projection is text-free (doc_id, dl, qtoks):
  * one long + a near-always-empty array per document, O(rows) not
  * O(bytes), and it feeds both the postings and the corpus stats so
  * the text is tokenized exactly once. Document-frequency + corpus
  * stats are tiny and ride ONE broadcast-build job (dfreq ⨯ stats ⨯
  * query terms), not one job each. Top-k per query is a ranked-window
  * filter.
  *
  * Scoring: classic Okapi BM25,
  *   idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   s(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
  */
object Bm25 {

  /** Top-k docs per query. `queries` is (query_id, term) with terms
    * already lowercased. Returns (query_id, doc_id, score, rk) with
    * score rounded to 4dp and rank ties broken by doc_id on the
    * ROUNDED score (cross-engine stable ordering).
    */
  def topK(docs: DataFrame, id: Column, text: Column, queries: DataFrame,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10,
      maxLiteralVocab: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // The query set is a search request — small by definition, and in
    // practice a local relation: collect WITHOUT a distinct so no
    // Spark job is needed, and dedup driver-side. The literal IN-list
    // prunes the token stream INSIDE the tokenize scan — strictly
    // better than a post-explode join while the vocab fits the
    // driver; past `maxLiteralVocab` terms fall back to a semi-join
    // against the (distributed) query relation so the operator stays
    // unbounded.
    val qTermsRaw = queries.select(col("term"))
      .limit(maxLiteralVocab + 1)
      .collect().map(_.getString(0)).toSeq
    // saturation is judged on the PRE-distinct row count: a saturated
    // limit means the collected prefix may be missing terms even if
    // duplicates compress its distinct size under the cap, so the
    // literal path would silently drop query terms from scoring
    val literalVocabComplete = qTermsRaw.size <= maxLiteralVocab
    val qTermsHead = qTermsRaw.distinct

    // ONE tokenize pass over the corpus, projected down to text-free
    // rows and cached; serves both the postings and the corpus stats.
    // On the literal path the query-vocab filter runs BEFORE the
    // persist, so the cached projection really is (doc_id, dl, qtoks)
    // with a near-always-empty array — caching the full token arrays
    // here would write the whole corpus back out in tokenized form.
    val base = docs
      .select(id.as("doc_id"), split(trim(lower(text)), "\\s+").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("bigint").as("dl"),
        (if (literalVocabComplete) filter(col("toks"), t => t.isInCollection(qTermsHead))
         else col("toks")).as("qtoks"))
      .sharedPersist()
    val termStream =
      if (literalVocabComplete)
        base.select(col("doc_id"), col("dl"), explode(col("qtoks")).as("term"))
      else
        base.select(col("doc_id"), col("dl"), explode(col("qtoks")).as("term"))
          .join(queries.select(col("term")).distinct(), Seq("term"), "left_semi")
    val tf = termStream
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // df-per-term ⨯ (n_docs, avgdl) ⨯ query terms: one small build
    // side, broadcast once.
    val qdim = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")))
      .join(queries, "term")

    val contrib = tf
      .join(broadcast(qdim), "term")
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("part",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))

    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("part")), 4).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("doc_id"), col("score"), col("rk"))
  }
}
