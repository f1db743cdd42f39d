package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CDC (change-data-capture) application — the lakehouse MERGE that
  * keeps a 100 TB snapshot current from an ordered change log of
  * upserts and deletes (Debezium-style I/U/D records with a version):
  * collapse the log to the latest change per key, then apply it to
  * the snapshot in one pass.
  *
  * Scale shape: the log collapse is one key-partitioned window (the
  * log is a day's changes — orders of magnitude smaller than the
  * snapshot); the apply is ONE full-outer join on the key. With the
  * snapshot bucketed on the key (A24) the snapshot side of that join
  * is shuffle-free; the output can be written back bucketed, making
  * daily CDC a single log-sized shuffle.
  */
object CdcApply {

  /** Latest change per key from an (op, version)-stamped log.
    * Version ties break toward deletes (a delete and upsert at the
    * same version = delete wins); a residual tie between two upserts
    * at the same version breaks on a hash of the full log row, so
    * the collapse is deterministic under any partitioning even on
    * logs that violate version uniqueness.
    */
  def collapseLog(log: DataFrame, key: Column, version: Column, op: Column): DataFrame = {
    val rowTb = xxhash64(log.columns.map(col): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__v").desc, col("__del").desc, col("__tb"))
    log
      .withColumn("__k", key)
      .withColumn("__v", version)
      .withColumn("__del", (op === "D").cast("int"))
      .withColumn("__tb", rowTb)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__tb")
  }

  /** Apply the collapsed log to `snapshot`: deletes drop the row,
    * upserts REPLACE-or-insert (the whole payload comes from the log
    * row, nulls included — not a partial patch), untouched snapshot
    * rows pass through. `dataCols` is the shared payload column
    * list; both inputs must carry them plus the key column.
    */
  def apply(snapshot: DataFrame, log: DataFrame, keyCol: String, versionCol: String,
      opCol: String, dataCols: Seq[String]): DataFrame = {
    val latest = collapseLog(log, col(keyCol), col(versionCol), col(opCol))
    val changes = latest.select(
      col("__k").as(keyCol),
      col("__del"),
      struct(dataCols.map(col): _*).as("__new"))

    snapshot
      .select(col(keyCol), struct(dataCols.map(col): _*).as("__old"))
      .join(changes, Seq(keyCol), "full_outer")
      .filter(col("__del").isNull || col("__del") === 0)
      .select(col(keyCol) +:
        dataCols.map(c =>
          when(col("__del").isNotNull, col(s"__new.$c"))
            .otherwise(col(s"__old.$c")).as(c)): _*)
  }
}
