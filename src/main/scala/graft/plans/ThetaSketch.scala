package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** KMV ("k minimum values") theta sketches — the distinct-count
  * sketch that, unlike HLL ([[HllSketch]]), supports set ALGEBRA:
  * union, and intersection/difference ESTIMATES between separately
  * built sketches. The sketch is the k smallest distinct 63-bit
  * hash values seen; theta = the k-th smallest; above k the distinct
  * estimate is (k-1) · 2^63 / theta; below k it is exact.
  *
  * Mergeable (partial/merge keeps the k smallest of the union —
  * ObjectHashAggregate partial/merge across partitions), persistable
  * (binary column), and composable: "docs in BOTH shards" /
  * "distinct in A but not B" are sketch-level operations over stored
  * bytes, no re-scan.
  */
object ThetaSketch {

  val DefaultK = 1024 // relative stddev ~ 1/sqrt(k-1) ≈ 3.1%

  final val HashSpace = Long.MaxValue // hashes mapped to [0, 2^63)

  /** The sorted k-smallest values in a buffer (ascending). */
  type Buffer = java.util.TreeSet[java.lang.Long]

  def newBuffer(): Buffer = new java.util.TreeSet[java.lang.Long]()

  def insert(buf: Buffer, k: Int, h63: Long): Unit = {
    buf.add(h63)
    if (buf.size > k) buf.pollLast() // drop the largest — keep k minima
  }

  def mergeInto(into: Buffer, k: Int, from: Buffer): Buffer = {
    val it = from.iterator()
    while (it.hasNext) insert(into, k, it.next())
    into
  }

  def estimate(values: Array[Long], k: Int): Long =
    if (values.length < k) values.length.toLong
    else {
      val theta = values.last // k-th smallest
      math.round((k - 1).toDouble * HashSpace / theta)
    }

  /** Intersection estimate of two sketches: count the common values
    * below min(theta_a, theta_b) and scale by the same inverse
    * sampling rate. Exact when both sides are below k.
    */
  def intersectEstimate(a: Array[Long], b: Array[Long], k: Int): Long = {
    if (a.isEmpty || b.isEmpty) return 0L
    val bothExact = a.length < k && b.length < k
    val thetaMin = math.min(
      if (a.length < k) HashSpace else a.last,
      if (b.length < k) HashSpace else b.last)
    val bs = b.toSet
    val common = a.count(v => v < thetaMin && bs.contains(v))
    if (bothExact) common.toLong
    else math.round(common.toDouble * HashSpace / thetaMin)
  }

  def serialize(buf: Buffer, k: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.size)
    bb.putInt(k)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def deserializeK(bytes: Array[Byte]): Int = ByteBuffer.wrap(bytes).getInt(0)

  def deserializeValues(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt // k
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  def hash63(v: Any, dt: DataType): Long =
    XxHash64Function.hash(v, dt, 42L) >>> 1 // non-negative 63-bit

  // ---- DataFrame API ----

  def thetaSketch(c: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(ThetaSketchAgg(GraftSqlShim.expression(c), k).toAggregateExpression())

  /** Sketch over an ALREADY-HASHED non-negative long column (e.g.
    * the portable md5-60-bit hash) — lets another engine rebuild the
    * identical k-minimum value set.
    */
  def thetaSketchPreHashed(c: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(
      ThetaSketchAgg(GraftSqlShim.expression(c), k, preHashed = true).toAggregateExpression())

  def thetaUnion(c: Column): Column =
    GraftSqlShim.column(ThetaUnionAgg(GraftSqlShim.expression(c)).toAggregateExpression())

  def thetaEstimate(c: Column): Column =
    GraftSqlShim.column(ThetaEstimateExpr(GraftSqlShim.expression(c)))

  def thetaIntersect(a: Column, b: Column): Column =
    GraftSqlShim.column(ThetaIntersectExpr(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}

case class ThetaSketchAgg(
    child: Expression,
    k: Int = ThetaSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    preHashed: Boolean = false)
  extends TypedImperativeAggregate[ThetaSketch.Buffer] with UnaryLike[Expression] {

  require(k >= 16, "k must be >= 16")

  override def createAggregationBuffer(): ThetaSketch.Buffer = ThetaSketch.newBuffer()

  override def update(buffer: ThetaSketch.Buffer, input: InternalRow): ThetaSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val h = if (preHashed) v.asInstanceOf[Long] else ThetaSketch.hash63(v, child.dataType)
      ThetaSketch.insert(buffer, k, h)
    }
    buffer
  }

  override def merge(buffer: ThetaSketch.Buffer, other: ThetaSketch.Buffer): ThetaSketch.Buffer =
    ThetaSketch.mergeInto(buffer, k, other)

  override def eval(buffer: ThetaSketch.Buffer): Any = ThetaSketch.serialize(buffer, k)

  override def serialize(buffer: ThetaSketch.Buffer): Array[Byte] =
    ThetaSketch.serialize(buffer, k)

  override def deserialize(bytes: Array[Byte]): ThetaSketch.Buffer = {
    val buf = ThetaSketch.newBuffer()
    ThetaSketch.deserializeValues(bytes).foreach(buf.add(_))
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_theta_sketch"
}

/** Union of stored theta sketches; adopts k from the first sketch. */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[(Int, ThetaSketch.Buffer)] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_union requires a binary sketch column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): (Int, ThetaSketch.Buffer) =
    (0, ThetaSketch.newBuffer())

  override def update(
      buffer: (Int, ThetaSketch.Buffer), input: InternalRow): (Int, ThetaSketch.Buffer) = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val bytes = v.asInstanceOf[Array[Byte]]
      val k = if (buffer._1 == 0) ThetaSketch.deserializeK(bytes) else buffer._1
      ThetaSketch.deserializeValues(bytes).foreach(ThetaSketch.insert(buffer._2, k, _))
      (k, buffer._2)
    }
  }

  override def merge(
      buffer: (Int, ThetaSketch.Buffer),
      other: (Int, ThetaSketch.Buffer)): (Int, ThetaSketch.Buffer) = {
    val k = if (buffer._1 != 0) buffer._1 else other._1
    if (k == 0) buffer
    else (k, ThetaSketch.mergeInto(buffer._2, k, other._2))
  }

  override def eval(buffer: (Int, ThetaSketch.Buffer)): Any =
    ThetaSketch.serialize(buffer._2, if (buffer._1 == 0) ThetaSketch.DefaultK else buffer._1)

  override def serialize(buffer: (Int, ThetaSketch.Buffer)): Array[Byte] =
    ThetaSketch.serialize(buffer._2, if (buffer._1 == 0) ThetaSketch.DefaultK else buffer._1)

  override def deserialize(bytes: Array[Byte]): (Int, ThetaSketch.Buffer) = {
    val buf = ThetaSketch.newBuffer()
    ThetaSketch.deserializeValues(bytes).foreach(buf.add(_))
    (ThetaSketch.deserializeK(bytes), buf)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_theta_union"
}

/** Distinct-count estimate of a stored sketch. */
case class ThetaEstimateExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("theta_estimate requires a binary sketch column")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    ThetaSketch.estimate(ThetaSketch.deserializeValues(bytes), ThetaSketch.deserializeK(bytes))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.ThetaSketch.estimate(graft.plans.ThetaSketch.deserializeValues($c), graft.plans.ThetaSketch.deserializeK($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection-cardinality estimate of two stored sketches. */
case class ThetaIntersectExpr(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("theta_intersect requires two binary sketch columns")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lb = l.asInstanceOf[Array[Byte]]
    val rb = r.asInstanceOf[Array[Byte]]
    ThetaSketch.intersectEstimate(
      ThetaSketch.deserializeValues(lb), ThetaSketch.deserializeValues(rb),
      math.min(ThetaSketch.deserializeK(lb), ThetaSketch.deserializeK(rb)))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"""graft.plans.ThetaSketch.intersectEstimate(
         |  graft.plans.ThetaSketch.deserializeValues($a),
         |  graft.plans.ThetaSketch.deserializeValues($b),
         |  java.lang.Math.min(graft.plans.ThetaSketch.deserializeK($a), graft.plans.ThetaSketch.deserializeK($b)))""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
