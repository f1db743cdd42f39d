package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch: a depth×width counter table answering point
  * frequency queries ("how often did THIS item occur") with
  * one-sided error — estimates never undercount, and overcount by at
  * most εn (ε ≈ e/width) with probability 1-1/e^depth. The point-
  * query complement of [[FreqSketch]] (which only surfaces the top
  * items, with UNDERcounts): token/domain/user frequencies over
  * 100 TB in depth·width longs, no groupBy over the key space.
  *
  * Mergeable EXACTLY: merge = elementwise add, which is commutative
  * and associative over longs — the merged sketch is byte-identical
  * to the one-shot sketch regardless of partitioning or batch order
  * (spec-verified), so per-shard sketches can be persisted and
  * unioned later (the C48 incremental-maintenance contract).
  *
  * Buckets derive from ONE md5 of the item — its two 64-bit lanes
  * seed all depth rows by double hashing — engine/JVM-independent,
  * like the portable hash family in SURVEY §4.
  */
object CmsSketch {

  val DefaultDepth = 4
  val DefaultWidth = 512

  final class Buffer(val depth: Int, val width: Int) {
    val counts: Array[Array[Long]] = Array.ofDim[Long](depth, width)
    var n: Long = 0L
  }

  // one digest instance per thread: getInstance per call would
  // allocate on every row of the sketch's hot update path
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row bucket via Kirsch-Mitzenmacher double hashing: ONE md5 of
    * the item yields two independent 64-bit lanes (h1, h2); row i
    * probes (h1 + i·h2) — the standard result that d-wise
    * independence is preserved, at 1/d the hashing cost.
    */
  def lanes(item: String): (Long, Long) = {
    val md = mdLocal.get()
    md.reset()
    val h = md.digest(item.getBytes(StandardCharsets.UTF_8))
    val bb = java.nio.ByteBuffer.wrap(h)
    (bb.getLong(0), bb.getLong(8))
  }

  def bucket(row: Int, h1: Long, h2: Long, width: Int): Int =
    (((h1 + row.toLong * h2) >>> 1) % width).toInt

  def offer(buf: Buffer, item: String): Unit = {
    val (h1, h2) = lanes(item)
    var r = 0
    while (r < buf.depth) {
      buf.counts(r)(bucket(r, h1, h2, buf.width)) += 1L
      r += 1
    }
    buf.n += 1L
  }

  def mergeInto(into: Buffer, from: Buffer): Buffer = {
    require(into.depth == from.depth && into.width == from.width,
      "cms sketches must share depth/width to merge")
    var r = 0
    while (r < into.depth) {
      var c = 0
      while (c < into.width) {
        into.counts(r)(c) += from.counts(r)(c)
        c += 1
      }
      r += 1
    }
    into.n += from.n
    into
  }

  def serialize(buf: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + buf.depth * buf.width * 8)
    bb.putInt(buf.depth)
    bb.putInt(buf.width)
    bb.putLong(buf.n)
    var r = 0
    while (r < buf.depth) {
      var c = 0
      while (c < buf.width) { bb.putLong(buf.counts(r)(c)); c += 1 }
      r += 1
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt, bb.getInt)
    buf.n = bb.getLong
    var r = 0
    while (r < buf.depth) {
      var c = 0
      while (c < buf.width) { buf.counts(r)(c) = bb.getLong; c += 1 }
      r += 1
    }
    buf
  }

  /** Point estimate: min over rows (the CMS query). */
  def query(buf: Buffer, item: String): Long = {
    val (h1, h2) = lanes(item)
    var best = Long.MaxValue
    var r = 0
    while (r < buf.depth) {
      val v = buf.counts(r)(bucket(r, h1, h2, buf.width))
      if (v < best) best = v
      r += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  /** Codegen entry point: query a serialized sketch. */
  def queryBytes(sketch: Array[Byte], item: UTF8String): Long =
    query(deserialize(sketch), item.toString)

  /** Aggregate a string column into a CMS (binary). */
  def sketch(c: Column, depth: Int = DefaultDepth, width: Int = DefaultWidth): Column =
    GraftSqlShim.column(CmsSketchAgg(GraftSqlShim.expression(c), depth, width)
      .toAggregateExpression())

  /** Merge stored CMS sketches (binary column → binary). */
  def union(c: Column): Column =
    GraftSqlShim.column(CmsUnionAgg(GraftSqlShim.expression(c)).toAggregateExpression())

  /** Point frequency estimate of `item` in a stored sketch. */
  def estimate(sketchCol: Column, item: Column): Column =
    GraftSqlShim.column(CmsQueryExpr(
      GraftSqlShim.expression(sketchCol), GraftSqlShim.expression(item)))
}

case class CmsSketchAgg(
    child: Expression,
    depth: Int = CmsSketch.DefaultDepth,
    width: Int = CmsSketch.DefaultWidth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsSketch.Buffer] with UnaryLike[Expression] {

  require(depth >= 1 && width >= 2)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_sketch requires string input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): CmsSketch.Buffer =
    new CmsSketch.Buffer(depth, width)

  override def update(buffer: CmsSketch.Buffer, input: InternalRow): CmsSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) CmsSketch.offer(buffer, v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: CmsSketch.Buffer, other: CmsSketch.Buffer): CmsSketch.Buffer =
    CmsSketch.mergeInto(buffer, other)

  override def eval(buffer: CmsSketch.Buffer): Any = CmsSketch.serialize(buffer)

  override def serialize(buffer: CmsSketch.Buffer): Array[Byte] =
    CmsSketch.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): CmsSketch.Buffer =
    CmsSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_cms_sketch"
}

case class CmsUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CmsSketch.Buffer]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_union requires binary input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Option[CmsSketch.Buffer] = None

  override def update(
      buffer: Option[CmsSketch.Buffer], input: InternalRow): Option[CmsSketch.Buffer] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = CmsSketch.deserialize(v.asInstanceOf[Array[Byte]])
      buffer match {
        case Some(b) => Some(CmsSketch.mergeInto(b, incoming))
        case None => Some(incoming)
      }
    }
  }

  override def merge(
      buffer: Option[CmsSketch.Buffer],
      other: Option[CmsSketch.Buffer]): Option[CmsSketch.Buffer] =
    (buffer, other) match {
      case (Some(a), Some(b)) => Some(CmsSketch.mergeInto(a, b))
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(buffer: Option[CmsSketch.Buffer]): Any =
    buffer.map(CmsSketch.serialize).orNull

  override def serialize(buffer: Option[CmsSketch.Buffer]): Array[Byte] =
    buffer.map(CmsSketch.serialize).getOrElse(Array.emptyByteArray)

  override def deserialize(bytes: Array[Byte]): Option[CmsSketch.Buffer] =
    if (bytes.isEmpty) None else Some(CmsSketch.deserialize(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_cms_union"
}

/** Point frequency query against a stored CMS binary. */
case class CmsQueryExpr(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_query requires (binary, string), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CmsSketch.query(
      CmsSketch.deserialize(sketch.asInstanceOf[Array[Byte]]),
      item.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (s, i) => s"graft.plans.CmsSketch.queryBytes($s, $i)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
