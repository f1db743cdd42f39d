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

  /** 60-bit md5-based signature (see [[SimHashMd5Expr]]). The token
    * hash is the big-endian first 8 md5 bytes shifted right 4 — i.e.
    * the first 15 hex chars as an unsigned 60-bit integer, exactly
    * what the DuckDB oracle parses.
    */
  def computeMd5(text: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val tokens = text.toString.toLowerCase.trim.split("\\s+")
    val votes = new Array[Int](60)
    var t = 0
    while (t < tokens.length) {
      val d = md.digest(tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = h >>> 4 // keep the leading 60 bits = first 15 hex chars
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

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

/** Oracle-portable 60-bit SimHash in one fused pass: token hash =
  * first 60 bits of md5 (= DuckDB `('0x'||substr(md5(t),1,15))::BIGINT`),
  * per-bit ±1 votes, sign → signature bit. Same signature as
  * `Dedup.simHashSignaturesAgg(bits=60, tokenHash=md5Hash60)` — which
  * stays as its verification baseline — but a narrow precompiled map:
  * no token explode, no wide aggregate, no generated-code compile on
  * the query path.
  */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHashOps.computeMd5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHashOps.computeMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashMd5Expr {
  def simhash60(text: Column): Column =
    GraftSqlShim.column(SimHashMd5Expr(GraftSqlShim.expression(text)))
}
