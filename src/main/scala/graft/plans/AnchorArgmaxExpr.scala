package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused anchor-cell assignment kernel: argmax over k anchor dot
  * products in ONE loop, the anchor matrix compiled once per
  * expression and shipped as a codegen reference (the C34 vocabulary
  * device). Ties resolve to the smallest anchor index — identical to
  * `array_position(dots, array_max(dots))`, the composition this
  * replaces.
  *
  * Why a kernel: the composed form builds an `array(k × dot)` whose
  * cast-per-dot fan-out grows the expression tree k-fold; at k=64 the
  * projection falls out of whole-stage codegen and every row pays
  * interpreted evaluation of 64 casts + 64 interpreted dot loops —
  * measured 7 s for a 20 k-row assignment at sf1 (~350 µs/row) vs
  * ~0.1 s fused. At 100 TB the assignment pass runs over every
  * embedding in the corpus, so the composed form is a scale defect,
  * not a constant.
  */
case class AnchorArgmaxExpr(child: Expression, anchors: Seq[Seq[Double]])
    extends UnaryExpression {

  @transient private lazy val matrix: Array[Array[Double]] =
    anchors.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"anchor_argmax requires array<double>/array<float> input, got ${other.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  @transient private lazy val isFloat =
    child.dataType == ArrayType(FloatType, true) ||
      child.dataType == ArrayType(FloatType, false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (isFloat) AnchorArgmaxOps.computeFloat(arr, matrix)
    else AnchorArgmaxOps.computeDouble(arr, matrix)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NOT classOf[...].getName — that is the JVM binary name "[[D",
    // which lands in the generated cast as `([[D) references[i]`,
    // fails Janino's parser ("Unexpected token [ in primary"), and
    // silently drops the WHOLE projection to interpreter mode
    val matRef = ctx.addReferenceObj("anchorMatrix", matrix, "double[][]")
    val method = if (isFloat) "computeFloat" else "computeDouble"
    defineCodeGen(ctx, ev, c => s"graft.plans.AnchorArgmaxOps.$method($c, $matRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AnchorArgmaxOps {

  def computeDouble(vec: ArrayData, m: Array[Array[Double]]): Int = {
    var best = Double.NegativeInfinity
    var bestI = 0
    var i = 0
    while (i < m.length) {
      val a = m(i)
      var acc = 0.0
      var d = 0
      val n = math.min(a.length, vec.numElements())
      while (d < n) { acc += a(d) * vec.getDouble(d); d += 1 }
      if (acc > best) { best = acc; bestI = i }
      i += 1
    }
    bestI
  }

  def computeFloat(vec: ArrayData, m: Array[Array[Double]]): Int = {
    var best = Double.NegativeInfinity
    var bestI = 0
    var i = 0
    while (i < m.length) {
      val a = m(i)
      var acc = 0.0
      var d = 0
      val n = math.min(a.length, vec.numElements())
      while (d < n) { acc += a(d) * vec.getFloat(d).toDouble; d += 1 }
      if (acc > best) { best = acc; bestI = i }
      i += 1
    }
    bestI
  }
}

object AnchorArgmaxExpr {
  def cell(vec: Column, anchors: Seq[Seq[Double]]): Column =
    GraftSqlShim.column(AnchorArgmaxExpr(GraftSqlShim.expression(vec), anchors))
}
