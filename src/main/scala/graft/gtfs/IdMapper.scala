package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ID mapping (mapping.py + realtime.py:201-209): a small
  * from→to dictionary applied to a column, unmapped ids passing
  * through unchanged. The dictionary is a broadcast dim — the 100 TB
  * side never shuffles.
  */
object IdMapper {

  /** Load a two-column `from;to` mapping CSV (the reference's
    * routes_mapping.csv / stops_mapping.csv shape).
    */
  def loadMappingCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "false")
      .option("sep", ";")
      .csv(path)
      .toDF("from_id", "to_id")

  /** Map `idCol` through the dictionary; identity for unmapped ids
    * (map_id's `dict.get(id, id)` semantics).
    */
  def mapIds(df: DataFrame, idCol: String, mapping: DataFrame): DataFrame = {
    val m = broadcast(mapping.select(col("from_id"), col("to_id")))
    df.join(m, df(idCol) === m("from_id"), "left")
      .withColumn(idCol, coalesce(col("to_id"), df(idCol)))
      .drop("from_id", "to_id")
  }
}
