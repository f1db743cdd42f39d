package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-gated positional span matcher: tokenize (the
  * [[SpanHashesExpr]] semantics — Spark-trim, limit -1 \s+ split),
  * hash every k-token span with md5Hash60, and emit `(p, shash)`
  * ONLY for spans the bloom filter might contain — all inside one
  * codegen'd call, so the corpus-sized span stream never becomes
  * rows.
  *
  * This is C61's probe-then-confirm device made positional: at sf10,
  * q_contam_spans' 24 M train spans cost ~6 s just to POSEXPLODE
  * (250 ns/row through Generate) before a broadcast join discarded
  * 99.4% of them; gating inside the array explodes only the ~0.6%
  * witness candidates. No false negatives (bloom property), and the
  * caller's exact confirm join against the eval span relation kills
  * the false positives — the final result provably equals the
  * ungated join's, which is why the query stays oracle-able.
  *
  * The bloom arrives as a CHILD expression (in practice the C61
  * scalar-subquery device, computed lazily at execution — never a
  * plan-time driver collect); a null bloom (empty eval side) yields
  * null, and exploding null yields the correct zero rows.
  */
case class SpanHitsExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, s"span width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"span_hits requires (string, binary) input, got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = SpanHitOps.schema

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(text: Any, bloom: Any): Any =
    SpanHitOps.compute(text.asInstanceOf[UTF8String],
      bloom.asInstanceOf[Array[Byte]], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, b) => s"graft.plans.SpanHitOps.compute($t, $b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanHitOps {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("p", LongType, nullable = false),
    StructField("shash", LongType, nullable = false))), containsNull = false)

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, bloom: Array[Byte], k: Int): ArrayData = {
    val s = text.toLowerCase.trim().toString
    val tokens = Ws.split(s, -1)
    val n = tokens.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    var hits: java.util.ArrayList[AnyRef] = null
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      val h = Md5Hash60Ops.hash60(UTF8String.fromString(sb.toString))
      if (BloomSketch.containsLong(bloom, h)) {
        if (hits == null) hits = new java.util.ArrayList[AnyRef](4)
        hits.add(new GenericInternalRow(Array[Any](i + 1L, h)): InternalRow)
      }
      i += 1
    }
    if (hits == null) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(hits.toArray)
  }
}

object SpanHitsExpr {
  def spanHits(text: Column, bloom: Column, k: Int): Column =
    GraftSqlShim.column(SpanHitsExpr(
      GraftSqlShim.expression(text), GraftSqlShim.expression(bloom), k))
}
