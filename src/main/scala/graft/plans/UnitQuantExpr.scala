package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Unit-quantization kernel: floor(x / ‖v‖₂ · scale) per element —
  * the integer-portable unit-vector form every cosine-exact oracle
  * path uses (C15/C132/C134). Replaces the composed
  * `transform(l2Normalize(v), x -> floor(x·scale))`, whose TWO
  * interpreted HOF passes (norm fold + divide-map) measured ~20 s of
  * q_mmr_select's 28 s at sf10 — the corpus-wide pass was the wall,
  * not the selection rounds.
  *
  * Bit-exact parity with the composition (spec-pinned): the norm
  * accumulates left-to-right in double exactly like the `aggregate`
  * fold and DuckDB's `list_aggregate 'sum'`; sqrt/divide/multiply
  * are IEEE exactly-rounded; floor matches. All-zero vectors divide
  * by zero into NaN exactly like the composition (floor(NaN) = 0 vs
  * null-propagation differences do not arise — Spark floor(NaN)
  * casts... the kernel reproduces the composition's NaN handling by
  * computing the identical double chain and applying the same
  * Math.floor; callers that must guard zeros do it upstream, as the
  * composition's callers already do).
  */
case class UnitQuantExpr(child: Expression, scale: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"unit_quant requires array<float|double> input, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  // dataType is only legal on a RESOLVED child — lazy so construction
  // during analysis (withNewChildInternal on unresolved trees) is safe
  private lazy val fromFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    UnitQuantOps.compute(input.asInstanceOf[ArrayData], fromFloat, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.UnitQuantOps.compute($c, $fromFloat, ${scale}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnitQuantOps {
  def compute(arr: ArrayData, fromFloat: Boolean, scale: Long): ArrayData = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      // float -> double widening first, exactly like the composition's
      // cast(array<double>)
      v(i) = if (fromFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    // left-to-right fold, the `aggregate(v, 0.0, acc + x*x)` order
    var acc = 0.0
    i = 0
    while (i < n) { acc += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(acc)
    val out = new Array[Long](n)
    i = 0
    while (i < n) { out(i) = math.floor(v(i) / nrm * scale).toLong; i += 1 }
    new GenericArrayData(out)
  }
}

object UnitQuantExpr {
  def unitQuant(vec: Column, scale: Long = 10000L): Column =
    GraftSqlShim.column(UnitQuantExpr(GraftSqlShim.expression(vec), scale))
}
