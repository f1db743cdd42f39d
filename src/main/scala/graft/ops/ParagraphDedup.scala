package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-level first-occurrence deduplication — the C4/Dolma
  * step between C1's whole-document hash (misses docs that share
  * SOME paragraphs) and C36's line-level boilerplate (removes only
  * lines above a document-frequency threshold): every paragraph
  * occurrence except the globally FIRST one (smallest (doc_id,
  * position)) is removed, and documents are reassembled from their
  * surviving paragraphs in order. Unlike C36 this is
  * order-dependent keep-first semantics — the first document to use
  * a paragraph keeps it, every later copy loses it — and unlike
  * C51's k-token spans the unit is the author's own paragraph
  * boundary.
  *
  * Scale shape (the C36/C51 discipline): paragraph text shuffles
  * ONCE, keyed by the document for reassembly. The ownership
  * decision shuffles only the 16-byte md5 key with its (doc_id, pos)
  * pair, and `min(struct(doc_id, pos))` is a partial-aggregable
  * aggregate — map-side combine collapses per-task repeats, no
  * per-key row window ranks occurrences.
  */
object ParagraphDedup {

  /** Per-doc result: (doc_id, n_paras, n_kept, text_kept) where
    * text_kept re-joins surviving paragraphs with `sep` (empty string
    * when every paragraph lost — the doc keeps its row, the C51
    * contract). Paragraphs are trimmed for both the key and the
    * reassembly; empty paragraphs (separator runs) are dropped before
    * counting.
    */
  def dedup(df: DataFrame, id: Column, text: Column,
      sepRegex: String = "\\n\\n", sepOut: String = "\n\n"): DataFrame = {
    val paras = df
      .select(id.cast("bigint").as("doc_id"),
        posexplode(split(text, sepRegex)).as(Seq("pos", "para")))
      .select(col("doc_id"), col("pos").cast("bigint").as("pos"),
        trim(col("para")).as("para"))
      .filter(length(col("para")) > 0)
    val keyed = paras.select(col("doc_id"), col("pos"), col("para"),
      md5(col("para")).as("pkey"))
    val owners = keyed
      .groupBy(col("pkey"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("own"))
      .select(col("pkey"), col("own.doc_id").as("own_doc"),
        col("own.pos").as("own_pos"))
    keyed
      .join(owners, Seq("pkey"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        count(when(col("doc_id") === col("own_doc") &&
          col("pos") === col("own_pos"), lit(1))).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("doc_id") === col("own_doc") &&
                col("pos") === col("own_pos"),
                struct(col("pos"), col("para"))))),
            s => s.getField("para")),
          sepOut).as("text_kept"))
  }

  /** DuckDB twin of [[dedup]] over `rel(doc_id, ptext)` (a CTE name
    * is fine); final relation `pdd(doc_id, n_paras, n_kept,
    * kept_md5)` — the text compared by md5, the C51 device. Pass the
    * same separator regex / output separator.
    */
  def dedupSql(rel: String, sepRegex: String = "\\n\\n",
      sepOut: String = "\\n\\n"): String =
    s"""pdp AS (
       |  SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS pos,
       |    trim(ps[CAST(g.i AS INT)]) AS para
       |  FROM (SELECT doc_id, string_split_regex(ptext, '$sepRegex') AS ps FROM $rel),
       |    unnest(range(1, len(ps) + 1)) AS g(i)
       |  WHERE len(trim(ps[CAST(g.i AS INT)])) > 0),
       |pdk AS (SELECT doc_id, pos, para, md5(para) AS pkey FROM pdp),
       |pdo AS (
       |  SELECT pkey, min(struct_pack(doc_id := doc_id, pos := pos)) AS own
       |  FROM pdk GROUP BY pkey),
       |pdd AS (
       |  SELECT k.doc_id, count(*) AS n_paras,
       |    count(CASE WHEN k.doc_id = (o.own).doc_id AND k.pos = (o.own).pos
       |      THEN 1 END) AS n_kept,
       |    md5(coalesce(string_agg(
       |      CASE WHEN k.doc_id = (o.own).doc_id AND k.pos = (o.own).pos
       |        THEN k.para END, e'$sepOut' ORDER BY k.pos), '')) AS kept_md5
       |  FROM pdk k JOIN pdo o USING (pkey)
       |  GROUP BY k.doc_id)""".stripMargin
}
