package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-regrouping kernel: whitespace-tokenize (Spark-trim, limit
  * -1 `\s+` split — the [[SpanHashesExpr]] conventions), join tokens
  * in groups of `perLine` with single spaces, join groups with
  * `sep`. The line/paragraph synthesizer under the C36 boilerplate
  * and C82 paragraph-dedup fixtures (the corpus ships newline-free,
  * so structure is derived from token positions).
  *
  * Replaces two interpreted compositions that were ~95% of their
  * queries' sf10 wall time:
  * - `array_join(transform(sequence(0, nLines-1), g =>
  *   array_join(slice(toks, g*n+1, n), " ")), "\n")` — the HOF
  *   lambda evaluates interpreted per GROUP with a fresh slice array
  *   and joined string each (q_boilerplate: 11-12 s of 11.2 s at
  *   sf10 was this transform, the actual boilerplate operator 0.4 s);
  * - `regexp_replace(norm, "((?:[^ ]+ ){n-1}[^ ]+) ", "$1\n\n")` —
  *   a backtracking group-capture replace over the whole corpus
  *   (the q_paragraph_dedup synthesizer).
  * Both equalities are spec-pinned (TokenLinesExprSpec) on the real
  * corpus and the whitespace edge cases (trailing tabs -> trailing
  * empty token, perLine 1, len % perLine == 0). One deliberate
  * divergence from the REGEX form only: text starting with
  * non-space whitespace (a leading tab survives Spark's space-only
  * trim) yields an empty first TOKEN here — identical to the HOF
  * composition — where the regex form instead preserved a literal
  * leading space that shifted no group boundary; the spec pins both
  * behaviors explicitly.
  */
case class TokenLinesExpr(child: Expression, perLine: Int, sep: String)
    extends UnaryExpression {
  require(perLine >= 1, s"perLine must be >= 1, got $perLine")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_lines requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenLinesOps.regroup(input.asInstanceOf[UTF8String], perLine, sep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenLinesOps.regroup($c, $perLine, $sepRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenLinesOps {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def regroup(text: UTF8String, perLine: Int, sep: String): UTF8String = {
    val s = text.trim().toString // Spark trim: 0x20 only
    val tokens = Ws.split(s, -1) // limit -1 keeps trailing empties, like StringSplit
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < tokens.length) {
      if (i > 0) sb.append(if (i % perLine == 0) sep else " ")
      sb.append(tokens(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object TokenLinesExpr {
  def tokenLines(text: Column, perLine: Int, sep: String): Column =
    GraftSqlShim.column(TokenLinesExpr(GraftSqlShim.expression(text), perLine, sep))
}
