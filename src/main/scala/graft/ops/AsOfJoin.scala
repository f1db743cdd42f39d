package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: for every left row, the most recent right row
  * with the same keys and right.time <= left.time.
  *
  * Spark has no native ASOF operator; the classic scalable
  * composition is used instead of a range self-join: tag both sides,
  * union, and carry the latest right payload forward with a
  * last(ignoreNulls) running window. ONE shuffle on the keys, linear
  * scan within each key partition — no per-row range probe, no
  * broadcast requirement, survives 100 TB fact tables.
  *
  * Tie semantics: right rows at exactly left.time match (inclusive,
  * like DuckDB/QuestDB ASOF). Among right rows sharing (keys, time),
  * the one with the greatest `tieBreak` wins — callers supply a
  * unique column for determinism.
  */
object AsOfJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tieBreak: String): DataFrame = {
    val keyCols = on.map(col)

    // tieBreak leads the payload struct so struct ordering == tieBreak
    // ordering among right rows sharing (keys, time)
    val r = right.select(
      (keyCols :+ col(rightTime).as("graft_ts") :+ lit(0).as("graft_side") :+
        struct((tieBreak +: rightPayload).map(col): _*).as("graft_payload")): _*)
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val l = left.select(
      (keyCols :+ col(leftTime).as("graft_ts") :+ lit(1).as("graft_side") :+
        lit(null).cast(r.schema("graft_payload").dataType).as("graft_payload") :+
        leftStruct.as("graft_left")): _*)
    val rWithLeft = r.withColumn("graft_left", lit(null).cast(l.schema("graft_left").dataType))

    // right rows sort before left rows at equal time (inclusive
    // match); among right ties the struct's trailing tieBreak orders
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("graft_ts"), col("graft_side"), col("graft_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rWithLeft.unionByName(l)
      .withColumn("graft_match", last(col("graft_payload"), ignoreNulls = true).over(w))
      .filter(col("graft_side") === 1)
      .select(col("graft_left.*"), col("graft_match").as("asof_match"))
  }
}
