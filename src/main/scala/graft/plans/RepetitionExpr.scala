package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass repetition statistics kernel: token count, distinct
  * token count, bigram count, and the max bigram multiplicity of a
  * document in ONE O(len) scan with two hash tables.
  *
  * The HOF formulation ([[graft.ops.TextAnalysis.repetitionMetricsHof]])
  * is O(len²) WITH A TRAP: `filter(bigrams, y -> y = x)` inside
  * `transform(array_distinct(bigrams), ...)` captures `bigrams` from
  * the enclosing scope, and whenever the stage falls out of
  * whole-stage codegen (wide projections trip the janino method-size
  * limit) the interpreted evaluator re-evaluates the captured
  * subtree — including the regex re-tokenization of the whole
  * document — once per distinct bigram: O(len²) full splits per row.
  * On 20k-char documents that is minutes per row. The kernel is the
  * hot-path implementation; the HOF stays as the semantic baseline
  * it is spec-verified against on short documents.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = RepetitionOps.schema

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RepetitionOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RepetitionOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionOps {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("max_bigram_count", LongType, nullable = false)))

  /** One pass: whitespace-tokenize the lowercased text, count
    * distinct tokens and the maximum bigram multiplicity. Matches the
    * HOF semantics exactly (empty text = one empty token; < 2 tokens
    * = zero bigrams).
    */
  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.toLowerCase.trim.split("\\s+")
    val n = toks.length
    val distinct = new java.util.HashSet[String](math.max(16, n * 2))
    var i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    var maxBg = 0
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Integer](n * 2)
      i = 0
      while (i < n - 1) {
        val bg = toks(i) + " " + toks(i + 1)
        val c = counts.merge(bg, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        if (c > maxBg) maxBg = c
        i += 1
      }
    }
    val nBg = if (n >= 2) (n - 1).toLong else 0L
    new GenericInternalRow(Array[Any](n.toLong, distinct.size.toLong, nBg, maxBg.toLong))
  }
}

object RepetitionExpr {
  def stats(text: Column): Column =
    GraftSqlShim.column(RepetitionStatsExpr(GraftSqlShim.expression(text)))
}
