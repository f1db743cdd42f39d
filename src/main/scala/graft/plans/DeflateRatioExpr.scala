package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio in milli units — the information-
  * density quality signal (the "zlib ratio" gate of CCNet/RefinedWeb
  * lineage): template boilerplate and repeated spans compress far
  * below ~450 milli, base64/binary paste sits near 1000+, natural
  * prose lands in between — a one-number complement to the C30
  * repetition and C83 char-entropy kernels that catches LONG-range
  * redundancy neither sees (a page duplicated once compresses ~2x
  * even though no 10-gram repeats and the char distribution is
  * unchanged).
  *
  * ratio_milli = floor(1000 * deflate_len / raw_len) over the UTF-8
  * bytes, deflate at BEST_COMPRESSION with a fresh Deflater per row
  * (no shared state, so rows evaluate identically anywhere).
  * Deterministic for a given zlib implementation, which is all a
  * single cluster runs — but NOT engine-portable (DuckDB has no
  * deflate), so the kernel is spec-covered, not oracled: SURVEY §4
  * keeps it out of the hash gate by design.
  *
  * One O(len) scan per row inside whole-stage codegen; nothing
  * shuffles (the C83 argument). Empty input -> 0.
  */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    DeflateRatioOps.ratioMilli(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DeflateRatioOps.ratioMilli($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatioOps {

  /** floor(1000 * deflateLen / rawLen); 0 for empty input. */
  def ratioMilli(text: UTF8String): Long = {
    val raw = text.getBytes
    if (raw.isEmpty) return 0L
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      1000L * compressed / raw.length
    } finally d.end()
  }
}

object DeflateRatioExprOps {
  def ratioMilli(text: Column): Column =
    GraftSqlShim.column(DeflateRatioExpr(GraftSqlShim.expression(text)))
}
