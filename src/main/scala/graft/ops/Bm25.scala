package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the inverted-index
  * scoring shape, expressed as dataframe algebra.
  *
  * Scale shape: the term stream is exploded ONCE and immediately
  * semi-joined (broadcast) against the query vocabulary, so only
  * postings for queried terms survive past the scan — the shuffle
  * that builds tf is keyed on (doc, term) over that filtered stream,
  * never the full corpus term stream. Document-frequency and corpus
  * stats are O(|vocab ∩ queries|) and O(1) and are broadcast back.
  * Top-k per query is a ranked-window filter (partial top-k per
  * partition before the shuffle via AQE/TakeOrdered semantics on
  * small k).
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
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // The query vocabulary is tiny by definition (it is a search
    // request), so it is materialized into literals and pushed INTO
    // the per-row token filter: only query-term occurrences are ever
    // exploded (≈ |queries|·|docs| rows, not the 10⁴× larger corpus
    // token stream), and no post-explode join is needed. The doc
    // length rides along (functionally dependent on doc_id → a free
    // extra group key), so one tokenize pass feeds both tf and dl.
    val qTerms = queries.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    // ONE tokenize pass over the corpus: project down to
    // (doc_id, dl, query-term matches) — the text column is gone, so
    // persisting the projection is cheap even at corpus scale — and
    // serve both the corpus stats (n_docs, avgdl) and the postings
    // from it.
    val base = docs
      .select(id.as("doc_id"), split(trim(lower(text)), "\\s+").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("bigint").as("dl"),
        filter(col("toks"), t => t.isInCollection(qTerms)).as("qtoks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("qtoks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    val contrib = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .join(broadcast(queries), "term")
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
