package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy hitters: at most `k` counters track the frequent
  * items of a stream; any item with true count > n/k is guaranteed to
  * survive, and each reported count is within n/k of truth
  * (an UNDERcount — never an overestimate after the decrement rule).
  *
  * Mergeable: partial summaries add counter-wise, then trim back to k
  * by subtracting the (k+1)-th largest count (the public MG merge
  * that preserves the error bound) — so frequent-domain / frequent-
  * token analysis over 100 TB is one pass with k counters per
  * partition, no groupBy over the full key space.
  */
object FreqSketch {

  val DefaultK = 64

  type Counters = scala.collection.mutable.HashMap[String, Long]

  def newCounters(): Counters = scala.collection.mutable.HashMap.empty

  /** MG update: count if tracked, adopt if room, else decrement all. */
  def offer(c: Counters, k: Int, item: String): Unit =
    c.get(item) match {
      case Some(n) => c.update(item, n + 1)
      case None if c.size < k => c.update(item, 1L)
      case None =>
        val dead = c.iterator.flatMap { case (it, n) =>
          if (n == 1L) Some(it) else { c.update(it, n - 1); None }
        }.toList
        dead.foreach(c.remove)
    }

  /** MG merge: add counter-wise, keep the k largest after subtracting
    * the (k+1)-th largest count from every survivor.
    */
  def mergeInto(into: Counters, k: Int, from: Counters): Counters = {
    from.foreach { case (item, n) => into.update(item, into.getOrElse(item, 0L) + n) }
    if (into.size > k) {
      val sorted = into.toSeq.sortBy { case (item, n) => (-n, item) }
      val cut = sorted(k)._2
      into.clear()
      sorted.take(k).foreach { case (item, n) =>
        if (n - cut > 0) into.update(item, n - cut)
      }
    }
    into
  }

  /** Descending (count, item) array — deterministic order. */
  def result(c: Counters): Seq[(String, Long)] =
    c.toSeq.sortBy { case (item, n) => (-n, item) }

  def serialize(c: Counters, k: Int): Array[Byte] = {
    val entries = result(c)
    val payloads = entries.map { case (item, _) => item.getBytes(StandardCharsets.UTF_8) }
    val size = 8 + entries.map(_ => 12).sum + payloads.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(k)
    bb.putInt(entries.size)
    entries.zip(payloads).foreach { case ((_, n), p) =>
      bb.putLong(n)
      bb.putInt(p.length)
      bb.put(p)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Int, Counters) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    val c = newCounters()
    (0 until n).foreach { _ =>
      val cnt = bb.getLong
      val len = bb.getInt
      val p = new Array[Byte](len)
      bb.get(p)
      c.update(new String(p, StandardCharsets.UTF_8), cnt)
    }
    (k, c)
  }

  /** Aggregate a string column into the heavy-hitter summary:
    * array<struct<item, min_count>> sorted by count descending.
    */
  def freqItems(c: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(FreqSketchAgg(GraftSqlShim.expression(c), k).toAggregateExpression())
}

case class FreqSketchAgg(
    child: Expression,
    k: Int = FreqSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.Counters] with UnaryLike[Expression] {

  require(k >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_items requires string input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): FreqSketch.Counters = FreqSketch.newCounters()

  override def update(buffer: FreqSketch.Counters, input: InternalRow): FreqSketch.Counters = {
    val v = child.eval(input)
    if (v != null) FreqSketch.offer(buffer, k, v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(
      buffer: FreqSketch.Counters, other: FreqSketch.Counters): FreqSketch.Counters =
    FreqSketch.mergeInto(buffer, k, other)

  override def eval(buffer: FreqSketch.Counters): Any = {
    val rows = FreqSketch.result(buffer).map { case (item, n) =>
      InternalRow(UTF8String.fromString(item), n)
    }
    new GenericArrayData(rows.toArray[Any]): ArrayData
  }

  override def serialize(buffer: FreqSketch.Counters): Array[Byte] =
    FreqSketch.serialize(buffer, k)

  override def deserialize(bytes: Array[Byte]): FreqSketch.Counters =
    FreqSketch.deserialize(bytes)._2

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("min_count", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_freq_items"
}
