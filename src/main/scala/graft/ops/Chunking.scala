package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the context-window preparation
  * step of RAG / long-document training pipelines: each document
  * becomes overlapping windows of `size` tokens advancing by
  * `size - overlap`.
  *
  * Scale shape: a pure narrow map — tokenize once per row, emit the
  * window index stream with `posexplode(sequence(...))`, slice each
  * window out of the token array. Zero shuffles, zero state; chunk
  * identity is (doc_id, chunk_id), so downstream repartitioning can
  * key on either the doc or the chunk hash.
  */
object Chunking {

  /** Chunk `text` into windows of `size` whitespace tokens with
    * `overlap` tokens shared between consecutive windows. Returns
    * (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_md5) where
    * chunk_md5 fingerprints the space-rejoined window (the exact
    * chunk payload, oracle-checkable without shipping the text).
    */
  def chunk(df: DataFrame, id: Column, text: Column, size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val nToks = org.apache.spark.sql.functions.size(col("toks"))
    val window = slice(col("toks"), col("start_tok") + 1, lit(size))
    df.select(id.as("doc_id"), split(trim(text), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), nToks - 1, lit(stride))).as(Seq("chunk_id", "start_tok")))
      .select(
        col("doc_id"),
        col("chunk_id").cast("bigint").as("chunk_id"),
        col("start_tok").cast("bigint").as("start_tok"),
        org.apache.spark.sql.functions.size(window).cast("bigint").as("n_chunk_tokens"),
        md5(array_join(window, " ")).as("chunk_md5"))
  }

  /** DuckDB twin of [[chunk]] (same tokenization, same windows). */
  def chunkSql(table: String, idExpr: String, textExpr: String, size: Int, overlap: Int): String = {
    val stride = size - overlap
    s"""WITH toks AS (SELECT $idExpr AS doc_id,
       |    string_split_regex(trim($textExpr), '\\s+') AS toks FROM $table),
       |win AS (SELECT doc_id, toks, u.start_tok,
       |          CAST(u.start_tok / $stride AS BIGINT) AS chunk_id
       |        FROM toks, unnest(range(0, len(toks), $stride)) AS u(start_tok))
       |SELECT doc_id, chunk_id, CAST(start_tok AS BIGINT) AS start_tok,
       |  CAST(len(list_slice(toks, start_tok + 1, start_tok + $size)) AS BIGINT) AS n_chunk_tokens,
       |  md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + $size), ' ')) AS chunk_md5
       |FROM win""".stripMargin
  }
}
