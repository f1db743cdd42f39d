package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing: what changed between two versions of a
  * document set — the audit step between pipeline runs ("today's
  * crawl vs yesterday's": what was added, what disappeared, what was
  * edited). One full-outer join on the id; change detection compares
  * md5 fingerprints, so document bodies never join or shuffle twice.
  */
object CorpusDiff {

  /** @return one row per id present in either snapshot:
    *         (doc_id, status ∈ {added, removed, changed, unchanged},
    *          old_md5, new_md5)
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, id: Column, content: Column): DataFrame = {
    val a = oldSnap.select(id.cast("bigint").as("doc_id"), md5(content).as("old_md5"))
    val b = newSnap.select(id.cast("bigint").as("doc_id"), md5(content).as("new_md5"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "removed")
          .when(col("old_md5") === col("new_md5"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_md5"), col("new_md5"))
  }

  /** Status counts — the one-line run report. */
  def summary(oldSnap: DataFrame, newSnap: DataFrame, id: Column, content: Column): DataFrame =
    diff(oldSnap, newSnap, id, content)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
