package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter: a bit-set membership sketch answering "was THIS item
  * ever inserted" with NO false negatives and a tunable false-positive
  * rate (~(1-e^{-kn/m})^k). The membership complement of [[CmsSketch]]
  * (frequencies) and [[ThetaSketch]] (cardinalities): at 100 TB the
  * natural broadcast shape for set-prune joins — ~10 bits/entry versus
  * the ~100+ bits/entry of a broadcast hash relation, so an eval-set /
  * blocklist / seen-key filter an order of magnitude past broadcast-
  * join size still ships to every executor.
  *
  * Because false positives exist, a bloom probe is a PREFILTER, not an
  * answer: downstream either tolerates FPs (cache admission, routing)
  * or confirms survivors with the exact join they just pruned
  * ([[graft.ops.Decontaminate]] — result provably equals the exact
  * join's, which is what keeps the operator DuckDB-oracle-able).
  *
  * Mergeable EXACTLY: merge = bitwise OR — commutative, associative,
  * idempotent — so the union of per-shard filters is byte-identical to
  * the one-shot filter under any partitioning (spec-verified), and
  * per-shard filters can be persisted and unioned later (the C48
  * incremental contract; idempotence additionally makes re-merging a
  * replayed shard harmless).
  *
  * Hashing: bigint items take two splitmix64-finalizer lanes
  * (Steele et al., "Fast splittable pseudorandom number generators",
  * OOPSLA 2014); strings take the two md5 lanes of the portable hash
  * family (SURVEY §4). Row i probes lane1 + i·lane2 — Kirsch-
  * Mitzenmacher double hashing, as in [[CmsSketch]].
  */
object BloomSketch {

  /** ~10 bits/entry at the default sizing targets ~1% FP for 100k
    * entries; callers size `numBits` ≈ 10 × expected insertions.
    */
  val DefaultBits = 1 << 20
  val DefaultHashes = 5

  final class Buffer(val numBits: Int, val numHashes: Int) {
    require(numBits >= 64 && numHashes >= 1)
    val words: Array[Long] = new Array[Long]((numBits + 63) >>> 6)
    var n: Long = 0L
  }

  /** splitmix64 finalizer: full-avalanche mix of a 64-bit value. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def lanesLong(item: Long): (Long, Long) = {
    val h1 = mix64(item)
    (h1, mix64(h1) | 1L) // odd step lane so probes cycle the full range
  }

  def lanesString(item: String): (Long, Long) = {
    val (h1, h2) = CmsSketch.lanes(item)
    (h1, h2 | 1L)
  }

  private def bitOf(i: Int, h1: Long, h2: Long, numBits: Int): Int =
    (((h1 + i.toLong * h2) >>> 1) % numBits).toInt

  def offer(buf: Buffer, h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < buf.numHashes) {
      val b = bitOf(i, h1, h2, buf.numBits)
      buf.words(b >>> 6) |= 1L << (b & 63)
      i += 1
    }
    buf.n += 1L
  }

  def mightContain(buf: Buffer, h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < buf.numHashes) {
      val b = bitOf(i, h1, h2, buf.numBits)
      if ((buf.words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def mergeInto(into: Buffer, from: Buffer): Buffer = {
    require(into.numBits == from.numBits && into.numHashes == from.numHashes,
      "bloom filters must share numBits/numHashes to merge")
    var w = 0
    while (w < into.words.length) {
      into.words(w) |= from.words(w)
      w += 1
    }
    into.n += from.n
    into
  }

  /** Fraction of set bits — the saturation diagnostic (FP rate of the
    * live filter ≈ fill^numHashes); > ~0.5 means the filter was
    * undersized for its insert load.
    */
  def fillRatio(buf: Buffer): Double = {
    var set = 0L
    var w = 0
    while (w < buf.words.length) { set += java.lang.Long.bitCount(buf.words(w)); w += 1 }
    set.toDouble / buf.numBits
  }

  def serialize(buf: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + buf.words.length * 8)
    bb.putInt(buf.numBits)
    bb.putInt(buf.numHashes)
    bb.putLong(buf.n)
    var w = 0
    while (w < buf.words.length) { bb.putLong(buf.words(w)); w += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt, bb.getInt)
    buf.n = bb.getLong
    var w = 0
    while (w < buf.words.length) { buf.words(w) = bb.getLong; w += 1 }
    buf
  }

  /** Probe the SERIALIZED filter in place — the per-row hot path of a
    * scan-side prefilter must not deserialize a multi-KB bit-set per
    * row (the allocation lesson of the C57 review). Wire layout:
    * [numBits:int][numHashes:int][n:long][words:long…].
    */
  private def containsBytes(bytes: Array[Byte], h1: Long, h2: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numBits = bb.getInt(0)
    val numHashes = bb.getInt(4)
    var i = 0
    while (i < numHashes) {
      val b = (((h1 + i.toLong * h2) >>> 1) % numBits).toInt
      if ((bb.getLong(16 + ((b >>> 6) << 3)) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Codegen entry points. */
  def containsLong(bytes: Array[Byte], item: Long): Boolean = {
    val (h1, h2) = lanesLong(item)
    containsBytes(bytes, h1, h2)
  }

  def containsString(bytes: Array[Byte], item: UTF8String): Boolean = {
    val (h1, h2) = lanesString(item.toString)
    containsBytes(bytes, h1, h2)
  }

  /** Aggregate a bigint or string column into a bloom filter (binary). */
  def sketch(c: Column, numBits: Int = DefaultBits,
      numHashes: Int = DefaultHashes): Column =
    GraftSqlShim.column(BloomSketchAgg(GraftSqlShim.expression(c), numBits, numHashes)
      .toAggregateExpression())

  /** Merge stored bloom filters (binary column → binary). */
  def union(c: Column): Column =
    GraftSqlShim.column(BloomUnionAgg(GraftSqlShim.expression(c)).toAggregateExpression())

  /** Membership probe of `item` against a stored filter. */
  def mightContain(sketchCol: Column, item: Column): Column =
    GraftSqlShim.column(BloomContainsExpr(
      GraftSqlShim.expression(sketchCol), GraftSqlShim.expression(item)))
}

case class BloomSketchAgg(
    child: Expression,
    numBits: Int = BloomSketch.DefaultBits,
    numHashes: Int = BloomSketch.DefaultHashes,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomSketch.Buffer] with UnaryLike[Expression] {

  require(numBits >= 64 && numHashes >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_sketch requires bigint or string input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): BloomSketch.Buffer =
    new BloomSketch.Buffer(numBits, numHashes)

  override def update(buffer: BloomSketch.Buffer, input: InternalRow): BloomSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) = v match {
        case l: java.lang.Long => BloomSketch.lanesLong(l)
        case s: UTF8String => BloomSketch.lanesString(s.toString)
      }
      BloomSketch.offer(buffer, h1, h2)
    }
    buffer
  }

  override def merge(buffer: BloomSketch.Buffer, other: BloomSketch.Buffer): BloomSketch.Buffer =
    BloomSketch.mergeInto(buffer, other)

  override def eval(buffer: BloomSketch.Buffer): Any = BloomSketch.serialize(buffer)

  override def serialize(buffer: BloomSketch.Buffer): Array[Byte] =
    BloomSketch.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): BloomSketch.Buffer =
    BloomSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_sketch"
}

case class BloomUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[BloomSketch.Buffer]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_union requires binary input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Option[BloomSketch.Buffer] = None

  override def update(
      buffer: Option[BloomSketch.Buffer], input: InternalRow): Option[BloomSketch.Buffer] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = BloomSketch.deserialize(v.asInstanceOf[Array[Byte]])
      buffer match {
        case Some(b) => Some(BloomSketch.mergeInto(b, incoming))
        case None => Some(incoming)
      }
    }
  }

  override def merge(
      buffer: Option[BloomSketch.Buffer],
      other: Option[BloomSketch.Buffer]): Option[BloomSketch.Buffer] =
    (buffer, other) match {
      case (Some(a), Some(b)) => Some(BloomSketch.mergeInto(a, b))
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(buffer: Option[BloomSketch.Buffer]): Any =
    buffer.map(BloomSketch.serialize).orNull

  override def serialize(buffer: Option[BloomSketch.Buffer]): Array[Byte] =
    buffer.map(BloomSketch.serialize).getOrElse(Array.emptyByteArray)

  override def deserialize(bytes: Array[Byte]): Option[BloomSketch.Buffer] =
    if (bytes.isEmpty) None else Some(BloomSketch.deserialize(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_union"
}

/** Membership probe against a stored bloom binary; probes the wire
  * bytes directly (zero per-row allocation), codegen'd.
  */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (binary, bigint|string), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(sketch: Any, item: Any): Any = item match {
    case l: java.lang.Long =>
      BloomSketch.containsLong(sketch.asInstanceOf[Array[Byte]], l)
    case s: UTF8String =>
      BloomSketch.containsString(sketch.asInstanceOf[Array[Byte]], s)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val fn = right.dataType match {
      case LongType => "containsLong"
      case StringType => "containsString"
    }
    defineCodeGen(ctx, ev, (s, i) => s"graft.plans.BloomSketch.$fn($s, $i)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_bloom_contains"
}
