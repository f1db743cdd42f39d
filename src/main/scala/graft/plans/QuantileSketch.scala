package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._

/** Mergeable quantile sketch (MRL/KLL-family, deterministic
  * compaction): items live in levels where level i carries weight
  * 2^i; when a level overflows its capacity it is sorted and every
  * other element (alternating offset per compaction — deterministic,
  * so the sketch is reproducible) is promoted to the next level.
  * Space is O(k · log(n/k)); rank error ~ O(log(n/k) / k).
  *
  * Unlike `approxQuantile` (a one-shot driver-side answer), the
  * sketch is a VALUE: built per day/source partition, persisted as a
  * binary column, merged level-wise across partitions and across
  * stored sketches — distribution monitoring over 100 TB without
  * re-scans. Completes the sketch family: distinct = [[HllSketch]] /
  * [[ThetaSketch]], frequency = [[FreqSketch]], quantiles = this.
  */
object QuantileSketch {

  val DefaultK = 200 // per-level capacity

  final class Buffer {
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
    val parities: ArrayBuffer[Boolean] = ArrayBuffer(false)
    var count: Long = 0L
  }

  private def ensureLevel(buf: Buffer, i: Int): Unit =
    while (buf.levels.size <= i) {
      buf.levels += ArrayBuffer.empty[Double]
      buf.parities += false
    }

  /** Sort + promote every other element; the surviving offset
    * alternates per compaction so neither rank direction is
    * systematically favored.
    */
  private def compact(buf: Buffer, k: Int, i: Int): Unit = {
    val level = buf.levels(i)
    val sorted = level.sortInPlace()
    val offset = if (buf.parities(i)) 1 else 0
    buf.parities(i) = !buf.parities(i)
    ensureLevel(buf, i + 1)
    val next = buf.levels(i + 1)
    var j = offset
    while (j < sorted.length) {
      next += sorted(j)
      j += 2
    }
    // odd sizes promote ceil(n/2) or floor(n/2) depending on the
    // alternating offset — the same ±w weight wobble KLL's random
    // coin has, absorbed by the error bound
    level.clear()
  }

  private def compactCascade(buf: Buffer, k: Int): Unit = {
    var i = 0
    while (i < buf.levels.size) {
      if (buf.levels(i).size >= k) compact(buf, k, i)
      i += 1
    }
  }

  def insert(buf: Buffer, k: Int, v: Double): Unit = {
    buf.levels(0) += v
    buf.count += 1
    if (buf.levels(0).size >= k) compactCascade(buf, k)
  }

  def mergeInto(into: Buffer, k: Int, from: Buffer): Buffer = {
    ensureLevel(into, from.levels.size - 1)
    var i = 0
    while (i < from.levels.size) {
      into.levels(i) ++= from.levels(i)
      i += 1
    }
    into.count += from.count
    compactCascade(into, k)
    into
  }

  /** Smallest stored value whose cumulative weight reaches q·total
    * (percentile_disc semantics over the weighted summary).
    */
  def query(buf: Buffer, q: Double): Double = {
    require(q >= 0.0 && q <= 1.0)
    val weighted = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < buf.levels.size) {
      val w = 1L << i
      buf.levels(i).foreach(v => weighted += ((v, w)))
      i += 1
    }
    if (weighted.isEmpty) return Double.NaN
    val sorted = weighted.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var acc = 0L
    var idx = 0
    while (idx < sorted.length) {
      acc += sorted(idx)._2
      if (acc >= target) return sorted(idx)._1
      idx += 1
    }
    sorted.last._1
  }

  def serialize(buf: Buffer): Array[Byte] = {
    val n = buf.levels.map(_.size).sum
    val bb = ByteBuffer.allocate(12 + buf.levels.size * 5 + n * 8)
    bb.putLong(buf.count)
    bb.putInt(buf.levels.size)
    buf.levels.indices.foreach { i =>
      bb.put(if (buf.parities(i)) 1.toByte else 0.toByte)
      bb.putInt(buf.levels(i).size)
      buf.levels(i).foreach(bb.putDouble)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer
    buf.count = bb.getLong
    val nLevels = bb.getInt
    ensureLevel(buf, nLevels - 1)
    (0 until nLevels).foreach { i =>
      buf.parities(i) = bb.get() == 1.toByte
      val n = bb.getInt
      (0 until n).foreach(_ => buf.levels(i) += bb.getDouble)
    }
    buf
  }

  // ---- DataFrame API ----

  def quantileSketch(c: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(
      QuantileSketchAgg(GraftSqlShim.expression(c), k).toAggregateExpression())

  def quantileUnion(c: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(
      QuantileUnionAgg(GraftSqlShim.expression(c), k).toAggregateExpression())

  /** Quantile estimate from a stored sketch binary. */
  def quantileEstimate(c: Column, q: Double): Column =
    GraftSqlShim.column(QuantileEstimateExpr(GraftSqlShim.expression(c), q))
}

case class QuantileSketchAgg(
    child: Expression,
    k: Int = QuantileSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Buffer] with UnaryLike[Expression] {

  require(k >= 8)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch requires numeric input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): QuantileSketch.Buffer = new QuantileSketch.Buffer

  override def update(
      buffer: QuantileSketch.Buffer, input: InternalRow): QuantileSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) QuantileSketch.insert(buffer, k, v.asInstanceOf[Number].doubleValue())
    buffer
  }

  override def merge(
      buffer: QuantileSketch.Buffer, other: QuantileSketch.Buffer): QuantileSketch.Buffer =
    QuantileSketch.mergeInto(buffer, k, other)

  override def eval(buffer: QuantileSketch.Buffer): Any = QuantileSketch.serialize(buffer)

  override def serialize(buffer: QuantileSketch.Buffer): Array[Byte] =
    QuantileSketch.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buffer =
    QuantileSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_quantile_sketch"
}

/** Union of stored quantile sketches. */
case class QuantileUnionAgg(
    child: Expression,
    k: Int = QuantileSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Buffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("quantile_union requires a binary sketch column")

  override def createAggregationBuffer(): QuantileSketch.Buffer = new QuantileSketch.Buffer

  override def update(
      buffer: QuantileSketch.Buffer, input: InternalRow): QuantileSketch.Buffer = {
    val v = child.eval(input)
    if (v == null) buffer
    else QuantileSketch.mergeInto(buffer, k,
      QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(
      buffer: QuantileSketch.Buffer, other: QuantileSketch.Buffer): QuantileSketch.Buffer =
    QuantileSketch.mergeInto(buffer, k, other)

  override def eval(buffer: QuantileSketch.Buffer): Any = QuantileSketch.serialize(buffer)

  override def serialize(buffer: QuantileSketch.Buffer): Array[Byte] =
    QuantileSketch.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buffer =
    QuantileSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_quantile_union"
}

case class QuantileEstimateExpr(child: Expression, q: Double)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("quantile_estimate requires a binary sketch column")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    QuantileSketch.query(QuantileSketch.deserialize(input.asInstanceOf[Array[Byte]]), q)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.QuantileSketch.query(graft.plans.QuantileSketch.deserialize($c), $q)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
