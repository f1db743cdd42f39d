package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.StructFilters
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.catalyst.util.{FailureSafeParser, PermissiveMode}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.util.SerializableHadoopConf

/** DataSourceV2 `TableProvider` mounting the JSONL corpus contract of
  * [[JsonlCorpus]] as `spark.read.format("graft-jsonl")`:
  *
  *   - **Explicit schema required** — inference is a full extra pass
  *     at corpus scale and type-drifts on dirty shards (the
  *     [[JsonlCorpus]] rule, now enforced by the connector).
  *   - **Column pruning is real**: the pruned schema reaches the
  *     Jackson parser, so unprojected fields are skipped during
  *     tokenization, never materialized.
  *   - **Filter pushdown is real**: supported predicates
  *     ([[StructFilters.pushedFilters]]) are evaluated INSIDE the
  *     parser (`JacksonParser`'s row-skip path) so non-matching lines
  *     die before row construction; every filter is also returned to
  *     Spark as residual, so pushdown is purely an optimization and
  *     never a correctness dependency.
  *   - **Corrupt-line quarantine preserved**: include
  *     [[JsonlCorpus.CorruptCol]] in the read schema and undecodable
  *     lines surface there with nulls elsewhere (PERMISSIVE), exactly
  *     like [[JsonlCorpus.read]].
  *
  * Scale shape: one input partition per shard file — JSONL corpora
  * are sharded by the writer contract (`maxRecordsPerFile`), so tasks
  * are bounded by shard size; `.gz` shards are stream-decoded (gzip
  * is not splittable, which is WHY the writer bounds shard rows).
  * Paths resolve through the Hadoop `FileSystem` of the driver's
  * session conf, shipped to executors via
  * [[graft.util.SerializableHadoopConf]].
  */
final class JsonlTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-jsonl"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-jsonl requires an explicit read schema (.schema(...)): inference is a " +
        "full extra pass at corpus scale and type-drifts on dirty shards")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-jsonl requires a path: .load(<dir-or-file>)")
    new JsonlTable(schema, path)
  }
}

private[sources] final class JsonlTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {

  override def name(): String = s"graft-jsonl `$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    new JsonlScanBuilder(tableSchema, path,
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()),
      spark.sessionState.conf.sessionLocalTimeZone)
  }
}

private[sources] final class JsonlScanBuilder(
    tableSchema: StructType, path: String,
    conf: SerializableHadoopConf, timeZoneId: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  /** Keep the parser-supported subset for in-parser skipping; return
    * EVERY filter as residual so Spark re-verifies — pushdown stays
    * an optimization, never a semantics carrier.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val dataSchema = StructType(tableSchema.filterNot(_.name == JsonlCorpus.CorruptCol))
    pushed = StructFilters.pushedFilters(filters, dataSchema)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new JsonlScan(required, pushed, path, conf, timeZoneId)
}

private[sources] final class JsonlScan(
    required: StructType, pushed: Array[Filter], path: String,
    conf: SerializableHadoopConf, timeZoneId: String)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-jsonl $path, ReadSchema: ${required.catalogString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def toBatch: Batch = this

  /** One partition per shard file; hidden/metadata entries (`_`/`.`
    * prefixed: _SUCCESS, .crc) are skipped.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    val status = fs.getFileStatus(p)
    val files =
      if (status.isFile) Seq(status.getPath.toString)
      else {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val s = it.next()
          val base = s.getPath.getName
          if (!base.startsWith("_") && !base.startsWith(".")) buf += s.getPath.toString
        }
        buf.toSeq.sorted
      }
    files.map(f => JsonlInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlReaderFactory(required, pushed, conf, timeZoneId)
}

private[sources] final case class JsonlInputPartition(file: String) extends InputPartition

private[sources] final class JsonlReaderFactory(
    required: StructType, pushed: Array[Filter],
    conf: SerializableHadoopConf, timeZoneId: String)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonlPartitionReader(
      partition.asInstanceOf[JsonlInputPartition].file,
      required, pushed, conf.value, timeZoneId)
}

private[sources] final class JsonlPartitionReader(
    file: String, required: StructType, pushed: Array[Filter],
    conf: Configuration, timeZoneId: String)
    extends PartitionReader[InternalRow] {

  private val reader: BufferedReader = {
    val p = new Path(file)
    val raw = p.getFileSystem(conf).open(p)
    val in = if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw
    new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
  }

  // count(*)-style scans prune every column: emit one empty row per
  // line without parsing (PERMISSIVE counts corrupt lines too)
  private val emitEmptyRows = required.isEmpty
  private val emptyRow = new GenericInternalRow(Array.empty[Any])

  private lazy val safeParser: FailureSafeParser[UTF8String] = {
    val parsedSchema = StructType(required.filterNot(_.name == JsonlCorpus.CorruptCol))
    val opts = new JSONOptions(Map.empty[String, String], timeZoneId, JsonlCorpus.CorruptCol)
    // re-scope the pushed filters to the columns this reader parses
    val parserFilters = StructFilters.pushedFilters(pushed, parsedSchema).toSeq
    val raw = new JacksonParser(parsedSchema, opts, allowArrayAsStructs = true, parserFilters)
    new FailureSafeParser[UTF8String](
      (in: UTF8String) => raw.parse(in, CreateJacksonParser.utf8String, identity[UTF8String]),
      PermissiveMode, required, JsonlCorpus.CorruptCol)
  }

  private var current: InternalRow = _
  private var pending: Iterator[InternalRow] = Iterator.empty

  override def next(): Boolean = {
    while (!pending.hasNext) {
      val line = reader.readLine()
      if (line == null) return false
      if (line.trim.nonEmpty)
        pending =
          if (emitEmptyRows) Iterator.single(emptyRow)
          else safeParser.parse(UTF8String.fromString(line))
    }
    current = pending.next()
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = reader.close()
}
