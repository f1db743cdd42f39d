package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing selection kernel (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS fingerprint device): the distinct minima of every
  * w-wide sliding window over a positional hash sequence. Guarantee:
  * two documents sharing any run of ≥ w+k−1 tokens (k = the span
  * width that produced the hashes) share at least one selected
  * fingerprint, while only ~2/(w+1) of all hashes are kept.
  *
  * One sliding pass with a monotone deque would be O(m); for
  * document-sized m (~100s) the simple O(m·w) scan below wins on
  * constant factor and stays trivially identical to the HOF/SQL
  * window-min formulation. The HOF composition it replaces
  * (transform(sequence) → array_min(slice) → array_distinct)
  * allocates a w-slice per POSITION interpreted — the same wall
  * WordGramsExpr/SpanHashesExpr removed (SURVEY §5 r11).
  *
  * Inputs shorter than w collapse to one whole-sequence minimum;
  * empty input yields an empty selection.
  */
case class WinnowExpr(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"winnow requires array<bigint> input, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowOps.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowOps.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowOps {
  /** Distinct window minima in first-occurrence order. */
  def compute(hashes: ArrayData, w: Int): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = hashes.toLongArray()
    if (m < w) {
      var mn = hs(0)
      var i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var i = 0
    while (i <= m - w) {
      var mn = hs(i)
      var j = 1
      while (j < w) { if (hs(i + j) < mn) mn = hs(i + j); j += 1 }
      seen.add(mn)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

object WinnowExpr {
  def winnow(hashes: Column, w: Int): Column =
    GraftSqlShim.column(WinnowExpr(GraftSqlShim.expression(hashes), w))
}
