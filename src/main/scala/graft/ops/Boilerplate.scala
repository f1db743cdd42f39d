package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (the CCNet/RefinedWeb dedup-by-line
  * pass): a line that appears in more than `maxDocFreq` distinct
  * documents is boilerplate (headers, footers, cookie banners, nav
  * text) and is dropped from every document; each document is then
  * reassembled from its surviving lines in original order.
  *
  * Scale shape: lines shuffle by their 16-byte md5 — never the line
  * text — to count distinct containing docs; the boilerplate key set
  * (lines with df > threshold) is far smaller than the corpus and
  * joins back broadcast-or-hash (AQE's choice); reassembly is one
  * shuffle keyed by doc. Three shuffles total, all fixed-width keys,
  * O(corpus lines) rows but O(16 bytes + line) payloads only on the
  * final doc-keyed exchange.
  */
object Boilerplate {

  /** Returns (doc_id, clean_md5, n_kept, n_removed): the md5 of the
    * newline-rejoined surviving lines (empty string when everything
    * was boilerplate — the doc row never disappears), with per-doc
    * kept/removed line counts.
    */
  def removeCommonLines(df: DataFrame, id: Column, text: Column, maxDocFreq: Int): DataFrame = {
    val lines = df
      .select(id.as("doc_id"), posexplode(split(text, "\n")).as(Seq("pos", "line")))
      .withColumn("k", md5(col("line")))
    val common = lines.groupBy(col("k"))
      .agg(countDistinct(col("doc_id")).as("line_df"))
      .filter(col("line_df") > maxDocFreq)
      .select(col("k"), lit(true).as("is_common"))
    lines
      .join(common, Seq("k"), "left")
      .groupBy(col("doc_id"))
      .agg(
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("is_common").isNull, struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          "\n")).as("clean_md5"),
        count(when(col("is_common").isNull, lit(1))).as("n_kept"),
        count(when(col("is_common").isNotNull, lit(1))).as("n_removed"))
  }

  /** DuckDB twin of [[removeCommonLines]] over a CTE/table `table`
    * with columns (doc_id, text).
    */
  def removeCommonLinesSql(table: String, maxDocFreq: Int): String =
    s"""lns AS (SELECT doc_id, string_split(text, chr(10)) AS lst FROM $table),
       |lines AS (
       |  SELECT doc_id, p.pos, lst[p.pos] AS line, md5(lst[p.pos]) AS k
       |  FROM lns, unnest(range(1, len(lst) + 1)) AS p(pos)),
       |common AS (
       |  SELECT k FROM lines GROUP BY k HAVING count(DISTINCT doc_id) > $maxDocFreq),
       |cleaned AS (
       |  SELECT doc_id,
       |    md5(COALESCE(string_agg(line, chr(10) ORDER BY pos)
       |      FILTER (WHERE k NOT IN (SELECT k FROM common)), '')) AS clean_md5,
       |    count(*) FILTER (WHERE k NOT IN (SELECT k FROM common)) AS n_kept,
       |    count(*) FILTER (WHERE k IN (SELECT k FROM common)) AS n_removed
       |  FROM lines GROUP BY doc_id)""".stripMargin
}
