package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.MqttBroker

/** DataSourceV2 micro-batch source for MQTT-shaped feeds — the
  * reference realtime server's subscribe loop (realtime.py:59-68,
  * 149-199: paho client with an ordered `(topic filter → payload
  * type)` subscription list, `_on_message` routed by the first
  * matching filter) mounted as a Structured Streaming source:
  *
  * {{{
  * spark.readStream.format("graft-mqtt")
  *   .option("broker", "rt")           // MqttBroker registry name
  *   .option("subscriptions",          // ordered filter:type pairs
  *     "gtfsrt/trip_update/#:trip_updates,gtfsrt/alert/#:service_alerts")
  *   .load()                           // topic, sub_type, payload, publish_ts, seq
  * }}}
  *
  * Routing happens AT THE SOURCE, exactly like `_on_message`: a
  * message is delivered only if some subscribed filter matches its
  * topic, and `sub_type` carries the first match's type — downstream
  * a pipeline routes with a plain `filter(col("sub_type") === ...)`
  * (no UDF, no re-parse), then [[graft.streaming.UpdateWire]] decodes
  * the payload for [[graft.streaming.GtfsRtPipeline]].
  *
  * Offset contract (what recovery correctness rests on): offsets are
  * the broker log's monotone sequence; a micro-batch is the DELIVERED
  * subset of `[start, end)`, and replaying the same range yields the
  * same rows — so a foreachBatch consumer crash-replayed from its
  * checkpoint re-sees the identical uncommitted batch (the pipeline's
  * applied-tag guard makes the re-apply a no-op). `commit` is a no-op:
  * retention is the broker's side of the contract (the in-JVM fixture
  * retains everything; a durable bridge retains past the consumer's
  * checkpoint horizon, the Kafka pattern).
  *
  * Scale shape: one input partition per micro-batch — an MQTT session
  * is a single ordered consumer (the reference's client is too);
  * parallelism at 100 TB comes from topic-sharded brokers, one source
  * per shard, unioned — each shard keeps its own offset line.
  */
final class MqttWireProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mqtt"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MqttWireProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MqttWireTable(new CaseInsensitiveStringMap(properties))
}

object MqttWireProvider {
  /** Delivered-message schema: the wire row [[graft.streaming.UpdateWire]]
    * parses `payload` out of, plus the routing/provenance columns.
    */
  val Schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("sub_type", StringType, nullable = false),
    StructField("payload", StringType, nullable = false),
    StructField("publish_ts", LongType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** Parse the ordered `filter:type,filter:type` subscription option
    * (the last `:` splits, so filters may contain `:`).
    */
  def parseSubscriptions(s: String): Seq[(String, String)] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { pair =>
      val cut = pair.lastIndexOf(':')
      require(cut > 0 && cut < pair.length - 1,
        s"subscription must be filter:type, got '$pair'")
      (pair.substring(0, cut), pair.substring(cut + 1))
    }
}

private final class MqttWireTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val brokerName = {
    val b = options.get("broker")
    require(b != null && b.nonEmpty, "graft-mqtt requires option 'broker'")
    b
  }
  private val subs = {
    val s = options.get("subscriptions")
    require(s != null && s.nonEmpty,
      "graft-mqtt requires option 'subscriptions' (filter:type,...)")
    MqttWireProvider.parseSubscriptions(s)
  }

  override def name(): String = s"graft-mqtt($brokerName)"
  override def schema(): StructType = MqttWireProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = MqttWireProvider.Schema
        override def description(): String = name()
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new MqttWireStream(brokerName, subs)
      }
    }
}

private final case class MqttWireOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

/** One delivered micro-batch ships inside its partition: the slice is
  * bounded by the batch (what arrived between two offsets), and the
  * routing filter already dropped unsubscribed topics driver-side —
  * the same place the broker session would.
  */
private final case class MqttWirePartition(
    rows: Array[(String, String, String, Long, Long)]) extends InputPartition

private final class MqttWireStream(brokerName: String,
    subs: Seq[(String, String)]) extends MicroBatchStream {

  override def initialOffset(): Offset = MqttWireOffset(0L)
  override def latestOffset(): Offset =
    MqttWireOffset(MqttBroker.get(brokerName).endSeq)
  override def deserializeOffset(json: String): Offset =
    MqttWireOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = () // retention is broker-side
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[MqttWireOffset].seq
    val until = end.asInstanceOf[MqttWireOffset].seq
    val delivered = MqttBroker.get(brokerName).slice(from, until)
      .flatMap { m =>
        MqttBroker.subscriptionType(subs, m.topic)
          .map(tpe => (m.topic, tpe, m.payload, m.publishTs, m.seq))
      }
    if (delivered.isEmpty) Array.empty
    else Array(MqttWirePartition(delivered.toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rows = p.asInstanceOf[MqttWirePartition].rows
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = {
            val (topic, tpe, payload, ts, seq) = rows(i)
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(topic), UTF8String.fromString(tpe),
              UTF8String.fromString(payload), ts, seq))
          }
          override def close(): Unit = ()
        }
    }
}
