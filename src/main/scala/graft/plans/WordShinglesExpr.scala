package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingling kernel: lowercase → whitespace-tokenize →
  * word k-grams → first-occurrence-distinct, in one Java method
  * instead of a five-deep interpreted HOF pipeline (split → sequence
  * → transform(concat_ws(slice)) → array_distinct), which costs ~10ms
  * per kilobyte-sized document. Semantics are identical to
  * [[graft.ops.TextAnalysis.wordShinglesHof]] (spec-verified);
  * codegen emits a straight static call, keeping the surrounding
  * stage in whole-stage codegen.
  */
case class WordShinglesExpr(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleOps.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleOps.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleOps {
  /** Distinct (first occurrence order) space-joined word k-grams of
    * the lowercased, whitespace-split text; texts shorter than k
    * words collapse to one whole-text shingle.
    */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val tokens = text.toString.toLowerCase.trim.split("\\s+")
    val out = new mutable.LinkedHashSet[String]
    if (tokens.length < k) {
      out += tokens.mkString(" ")
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= tokens.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        out += sb.toString
        i += 1
      }
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  /** ALL space-joined word k-grams in position order — multiplicity
    * preserved (the n-gram COUNTING kernel; [[compute]] dedups for
    * set-similarity). Same tokenization and short-text convention.
    */
  def computeAll(text: UTF8String, k: Int): ArrayData = {
    val tokens = text.toString.toLowerCase.trim.split("\\s+")
    if (tokens.length < k)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(tokens.mkString(" "))))
    val n = tokens.length - k + 1
    val out = new Array[Any](n)
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
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Multiplicity-preserving sibling of [[WordShinglesExpr]]: every
  * k-gram in position order, for occurrence counting (C131). Same
  * codegen shape — one static call, stage stays in whole-stage
  * codegen.
  */
case class WordGramsExpr(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_grams requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleOps.computeAll(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleOps.computeAll($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGramsExpr {
  def grams(text: Column, k: Int): Column =
    GraftSqlShim.column(WordGramsExpr(GraftSqlShim.expression(text), k))
}

object WordShinglesExpr {
  def shingles(text: Column, k: Int): Column =
    GraftSqlShim.column(WordShinglesExpr(GraftSqlShim.expression(text), k))
}
