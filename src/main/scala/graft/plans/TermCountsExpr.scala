package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass term-frequency kernel: lowercase → whitespace-tokenize
  * → token→count map, in ONE O(len) scan with one hash table.
  *
  * This is the map-side combine of every tf-based operator (term
  * statistics, vocabulary, tf-idf/BM25) done inside the row: a
  * document's tokens all live in one row, so its full (term, tf)
  * output is computable narrowly — `explode(term_counts(text))`
  * yields the per-doc postings WITHOUT materializing the corpus token
  * stream through an explode + hash-aggregate. The downstream shuffle
  * (df per term, per-doc ranking) then carries exactly the same rows
  * a partial-aggregated explode would, but the dominant CPU cost —
  * one hash-map update per token — runs as a tight loop instead of
  * per-row codegen'd aggregate machinery over exploded rows.
  *
  * Tokenization matches `split(trim(lower(text)), "\\s+")` exactly
  * (spec-proven parity with the explode formulation); keys are in
  * first-occurrence order, which no consumer may rely on (maps are
  * unordered semantically — every query using this ends in its own
  * ORDER BY).
  */
case class TermCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_counts requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TermCountsOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TermCountsOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCountsOps {
  /** token→count of the lowercased whitespace-split text; empty text
    * yields {"" → 1} (Java split of "" is [""], matching Spark's
    * split semantics for the explode baseline).
    */
  def compute(text: UTF8String): MapData = {
    val toks = text.toString.toLowerCase.trim.split("\\s+")
    val counts = new java.util.LinkedHashMap[String, Long](math.max(16, toks.length * 2))
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    val n = counts.size
    val keys = new Array[Any](n)
    val values = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      values(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
}

object TermCountsExpr {
  def termCounts(text: Column): Column =
    GraftSqlShim.column(TermCountsExpr(GraftSqlShim.expression(text)))
}
