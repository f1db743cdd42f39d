package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of md5 as a non-negative bigint — the
  * engine-portable base hash under every dedup/span/posting pipeline
  * (DuckDB twin: `('0x'||substr(md5(x),1,15))::BIGINT`).
  *
  * This kernel replaces the composed
  * `conv(substring(md5(x), 1, 15), 16, 10) CAST bigint` form: that
  * chain materializes a 32-char hex string, a 15-char substring and
  * a base-conversion parse PER ROW — three string allocations to
  * extract 8 bytes the digest already holds. Here the digest's first
  * 8 bytes pack straight into the long (`>>> 4` drops to 60 bits —
  * exactly the 15-hex-digit prefix), the input's UTF-8 bytes are
  * read without a String round-trip, and the MessageDigest is
  * thread-local. Same longs, no garbage: the hash pass under a
  * 100 TB shingle stream is allocation-bound before it is CPU-bound.
  */
case class Md5Hash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_hash60 requires string input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Md5Hash60Ops.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Hash60Ops.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60Ops {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h >>> 4 // first 15 hex chars = leading 60 bits, always >= 0
  }
}

object Md5Hash60Expr {
  def hash60(c: Column): Column =
    GraftSqlShim.column(Md5Hash60Expr(GraftSqlShim.expression(c)))
}
