package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** HyperLogLog sketch primitives for 100 TB distinct counting.
  *
  * `approx_count_distinct` gives a NUMBER; these give the SKETCH —
  * a fixed 2^p-byte register array that is:
  *  - mergeable: partial sketches combine by elementwise max, which
  *    is exactly what the partial/merge aggregate path does across
  *    partitions (no row ever crosses the shuffle, only registers);
  *  - persistable: a binary column you can write per day/source
  *    partition;
  *  - unionable: [[HllUnionAgg]] re-aggregates stored sketches, so
  *    "distinct users over any ad-hoc span of days" is a metadata-
  *    sized query over pre-built sketches instead of a re-scan of
  *    the raw 100 TB.
  *
  * Standard HLL estimator (Flajolet et al.; the public HLL paper's
  * alpha_m bias constant + linear counting for the small range; the
  * 64-bit hash makes the large-range correction unnecessary). Hash is
  * Spark's own xxhash64 (seed 42) over the input value, so sketches
  * built anywhere in the engine agree bit-for-bit.
  */
object HllSketch {

  val DefaultPrecision = 12 // 4096 registers, sigma ~ 1.04/sqrt(m) = 1.6%

  def numRegisters(p: Int): Int = 1 << p

  /** registers[idx] = max(rank of first set bit in the remaining
    * hash bits), idx = low p bits of the hash.
    */
  def updateRegisters(regs: Array[Byte], hash: Long, p: Int): Unit = {
    val idx = (hash & ((1L << p) - 1)).toInt
    val w = hash >>> p
    // rank in 1..(64-p)+1; w==0 -> all remaining bits zero -> max rank
    val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfTrailingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def mergeRegisters(into: Array[Byte], from: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < into.length) {
      if (from(i) > into(i)) into(i) = from(i)
      i += 1
    }
    into
  }

  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  // ---- DataFrame API ----

  /** Aggregate a column into a binary HLL sketch. */
  def hllSketch(c: Column, precision: Int = DefaultPrecision): Column =
    GraftSqlShim.column(
      HllSketchAgg(GraftSqlShim.expression(c), precision).toAggregateExpression())

  /** Sketch over an ALREADY-HASHED long column (e.g. the
    * engine-portable md5-60-bit hash) instead of hashing internally —
    * lets another engine rebuild the identical registers.
    */
  def hllSketchPreHashed(c: Column, precision: Int = DefaultPrecision): Column =
    GraftSqlShim.column(
      HllSketchAgg(GraftSqlShim.expression(c), precision, preHashed = true)
        .toAggregateExpression())

  /** Union previously built sketches (binary column) into one sketch. */
  def hllUnion(c: Column): Column =
    GraftSqlShim.column(
      HllUnionAgg(GraftSqlShim.expression(c)).toAggregateExpression())

  /** Estimate distinct count from a sketch (scalar, usable on a
    * persisted sketch column).
    */
  def hllEstimate(c: Column): Column =
    GraftSqlShim.column(HllEstimateExpr(GraftSqlShim.expression(c)))

  /** Convenience: estimated distinct count of a column. */
  def hllDistinct(c: Column, precision: Int = DefaultPrecision): Column =
    hllEstimate(hllSketch(c, precision))
}

/** Sketch-building aggregate: partial sketches on the map side, merged
  * registers across the exchange (ObjectHashAggregate partial/merge).
  */
case class HllSketchAgg(
    child: Expression,
    precision: Int = HllSketch.DefaultPrecision,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    preHashed: Boolean = false)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(precision >= 4 && precision <= 16, "precision must be in [4, 16]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (!preHashed || child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("preHashed hll_sketch requires a bigint hash column")

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](HllSketch.numRegisters(precision))

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = if (preHashed) v.asInstanceOf[Long]
              else XxHash64Function.hash(v, child.dataType, 42L)
      HllSketch.updateRegisters(buffer, h, precision)
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    HllSketch.mergeRegisters(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  // copy: merge mutates the buffer in place, and incoming bytes may
  // alias a reused serialization buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_hll_sketch"
}

/** Union aggregate over stored sketches: elementwise register max.
  * Buffer starts empty (zero-length) and adopts the first sketch's
  * size, so one aggregate works for any precision.
  */
case class HllUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_union requires a binary sketch column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer
    else merge(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other.clone()
    else {
      require(buffer.length == other.length,
        s"cannot union sketches of different precision (${buffer.length} vs ${other.length})")
      HllSketch.mergeRegisters(buffer, other)
    }

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HllUnionAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_hll_union"
}

/** Scalar estimator over a sketch binary (usable on persisted
  * sketches without re-aggregating).
  */
case class HllEstimateExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_estimate requires a binary sketch column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HllSketch.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HllSketch.estimate($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
