package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-distribution statistics kernel: codepoint
  * count, distinct-codepoint count, and Shannon entropy of the
  * character distribution in integer micro-nats — the classic
  * gibberish / encoding-noise gate (near-zero entropy = one-symbol
  * runs and template junk; far-above-language-typical entropy =
  * base64 blobs, compressed-garbage paste) that complements the
  * token-level C30 repetition and C42 source-drift statistics.
  *
  * One O(len) scan per row inside whole-stage codegen; NOTHING
  * shuffles (the per-char explode+groupBy formulation this replaces
  * exchanges every character of the corpus — at 100 TB that is the
  * difference between a narrow map and a corpus-sized shuffle).
  *
  * Entropy is emitted as the exact integer
  * `Σ_c floor(−(n_c/n)·ln(n_c/n)·1e6)` over distinct codepoints in
  * codepoint order — the C42 micro-nat device: per-term flooring
  * then integer summation makes the result independent of
  * accumulation order and engine-portable (the DuckDB twin sums the
  * identical per-character terms).
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = CharEntropyOps.schema

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CharEntropyOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharEntropyOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyOps {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct_chars", LongType, nullable = false),
    StructField("entropy_micro", LongType, nullable = false)))

  /** One pass over the string's codepoints. Empty text → (0, 0, 0). */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Long](64)
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(Integer.valueOf(cp), java.lang.Long.valueOf(1L), (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var entropyMicro = 0L
    if (n > 0) {
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        val p = c.toDouble / n
        entropyMicro += math.floor(-p * math.log(p) * 1e6).toLong
      }
    }
    new GenericInternalRow(Array[Any](n, counts.size.toLong, entropyMicro))
  }
}

object CharEntropyExprOps {
  def stats(text: Column): Column =
    GraftSqlShim.column(CharEntropyExpr(GraftSqlShim.expression(text)))
}
