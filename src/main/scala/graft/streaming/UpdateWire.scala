package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wire decode for externally-transported trip updates — the
  * reference's MQTT subscriber parses each message payload into an
  * update record before matching (realtime.py:149-199); here the
  * transport hands Spark a stream of raw payload strings (socket
  * source line, Kafka record value, file line) and this step turns
  * them into the typed update rows [[GtfsRtPipeline.start]] consumes.
  *
  * Malformed payloads (from_json null-out) are dropped rather than
  * poisoning the batch — the transport is untrusted; the pipeline's
  * own matching stage is the next validation gate.
  */
object UpdateWire {

  /** Schema of one trip-update payload, matching the pipeline's
    * expected columns.
    */
  val updateSchema: StructType = StructType(Seq(
    StructField("trip_update_id", StringType),
    StructField("trip_id", StringType),
    StructField("route_id", StringType),
    StructField("start_time", StringType),
    StructField("stop_time_updates", ArrayType(StructType(Seq(
      StructField("stop_sequence", IntegerType),
      StructField("stop_id", StringType))))),
    StructField("event_ts", LongType)))

  /** Parse a stream (or batch) of JSON payload strings in `valueCol`
    * into typed update rows. Rows whose payload fails to parse or
    * lacks a trip_update_id are dropped.
    */
  def parseUpdates(lines: DataFrame, valueCol: String = "value"): DataFrame =
    lines
      .select(from_json(col(valueCol).cast("string"), updateSchema).as("u"))
      .select(col("u.*"))
      .filter(col("trip_update_id").isNotNull)
}
