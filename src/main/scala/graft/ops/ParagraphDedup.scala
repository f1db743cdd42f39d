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
    *
    * `shards` hash-range-partitions the ownership aggregate AND the
    * ownership join (the C128 union-of-bounded-sub-queries device):
    * grouping/joining on `pkey` is key-local, so a K-way
    * `hash(pkey) % K` split computes identical results while each
    * sub-aggregate's hash table and each sub-join's build side hold
    * 1/K of the keys — this is what lets the single-node oracle run
    * the 41 M-paragraph sf10 corpus inside a memory cap instead of
    * OOMing (the pre-r12 exemption). `pdk` is MATERIALIZED so the
    * shards re-scan the paragraph table instead of re-running the
    * split per shard. shards=1 degenerates to the unsharded plan.
    */
  def dedupSql(rel: String, sepRegex: String = "\\n\\n",
      sepOut: String = "\\n\\n", shards: Int = 1): String = {
    require(shards >= 1, "shards must be >= 1")
    val shardJoins = (0 until shards).map { s =>
      val pred =
        if (shards == 1) "TRUE"
        else s"hash(pkey) % $shards = $s"
      s"""pj$s AS (
         |  SELECT k.doc_id, k.pos, k.para,
         |    CASE WHEN k.doc_id = (o.own).doc_id AND k.pos = (o.own).pos
         |      THEN 1 ELSE 0 END AS kept
         |  FROM (SELECT * FROM pdk WHERE $pred) k
         |  JOIN (SELECT pkey, min(struct_pack(doc_id := doc_id, pos := pos)) AS own
         |        FROM pdk WHERE $pred GROUP BY pkey) o
         |  USING (pkey))""".stripMargin
    }
    val unionAll = (0 until shards)
      .map(s => s"SELECT doc_id, pos, para, kept FROM pj$s")
      .mkString("\n  UNION ALL\n  ")
    s"""pdp AS (
       |  SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS pos,
       |    trim(ps[CAST(g.i AS INT)]) AS para
       |  FROM (SELECT doc_id, string_split_regex(ptext, '$sepRegex') AS ps FROM $rel),
       |    unnest(range(1, len(ps) + 1)) AS g(i)
       |  WHERE len(trim(ps[CAST(g.i AS INT)])) > 0),
       |pdk AS MATERIALIZED (SELECT doc_id, pos, para, md5(para) AS pkey FROM pdp),
       |${shardJoins.mkString(",\n")},
       |pju AS (
       |  $unionAll),
       |pdd AS (
       |  SELECT doc_id, count(*) AS n_paras,
       |    CAST(sum(kept) AS BIGINT) AS n_kept,
       |    md5(coalesce(string_agg(
       |      CASE WHEN kept = 1 THEN para END, e'$sepOut' ORDER BY pos), ''))
       |      AS kept_md5
       |  FROM pju GROUP BY doc_id)""".stripMargin
  }
}
