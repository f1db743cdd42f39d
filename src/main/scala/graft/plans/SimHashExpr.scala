package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document computed in a single pass: tokenize,
  * xxhash64 each token (Spark's own hash — seed 42, identical to the
  * `xxhash64` SQL function on strings), vote ±1 per bit per token
  * occurrence, sign → signature bit.
  *
  * Replaces the explode → groupBy(64 sums) formulation: same
  * signature, but a narrow per-row map with NO shuffle — at corpus
  * scale the signature stage goes from a 64-aggregate hash exchange
  * over every token to a pure scan.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHashOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHashOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashOps {
  def compute(text: UTF8String): Long = {
    val tokens = text.toString.toLowerCase.trim.split("\\s+")
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(tokens(t)), StringType, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

object SimHashExpr {
  def simhash(text: Column): Column =
    GraftSqlShim.column(SimHashExpr(GraftSqlShim.expression(text)))
}
