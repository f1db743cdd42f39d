package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional word-k-gram hash kernel: lowercase → trim → whitespace
  * tokens → md5Hash60 of every k-token span, in position order — the
  * device under span-level contamination localization (C89) and any
  * future positional-span consumer.
  *
  * Replaces the composed pipeline
  * `posexplode(transform(sequence(1, size(toks)-k+1),
  * p => md5Hash60(array_join(slice(toks, p, k), " "))))` over
  * `split(trim(lower(text)), "\\s+")`: higher-order functions
  * evaluate their lambda interpreted per element, and slice +
  * array_join allocate a fresh array and string per POSITION —
  * ~13 us per span, which at sf10's 24 M train-side spans was 12 of
  * q_contam_spans' 16.5 s. One pass here: tokenize once, build each
  * span in a reused StringBuilder, hash via the shared thread-local
  * MD5. The hash VALUES are bit-identical to the composed form
  * (same md5Hash60 over the same joined strings), so downstream
  * join results cannot move.
  *
  * Exact-parity notes (spec-pinned in SpanHashesExprSpec):
  * - trim is Spark's trim (0x20 spaces only, NOT java trim's <=0x20)
  *   via UTF8String.trim, and lower is UTF8String.toLowerCase — the
  *   same calls the `trim`/`lower` expressions make;
  * - the split is java-regex `\s+` with limit -1 (Spark's
  *   StringSplit default), so a leading tab yields a leading empty
  *   token and trailing whitespace yields a trailing one, exactly
  *   like the composition;
  * - fewer than k tokens -> empty array (the composition's
  *   `size(toks) >= k` filter, folded in).
  */
case class SpanHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"span width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"span_hashes requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SpanHashOps.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SpanHashOps.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanHashOps {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, k: Int): ArrayData = {
    // UTF8String.toLowerCase / .trim are what Spark's lower()/trim()
    // evaluate — NOT java String equivalents (java trim strips all
    // bytes <= 0x20; Spark trim strips 0x20 only)
    val s = text.toLowerCase.trim().toString
    val tokens = Ws.split(s, -1) // limit -1 keeps trailing empties, like StringSplit
    val n = tokens.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
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
      out(i) = Md5Hash60Ops.hash60(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object SpanHashesExpr {
  def spanHashes(text: Column, k: Int): Column =
    GraftSqlShim.column(SpanHashesExpr(GraftSqlShim.expression(text), k))
}
