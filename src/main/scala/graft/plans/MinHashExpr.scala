package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature kernel over a shingle array, using the
  * oracle-portable hash family of [[graft.ops.Dedup.minHashLshMd5]]:
  * base = first 60 bits of md5(shingle) mod p=2^31-1, then
  * `numHashes` affine maps (a_i·base + b_i) mod p, elementwise-min
  * folded in one pass. Replaces the interpreted
  * aggregate(transform(...), zip_with(...)) HOF pipeline — one md5
  * per shingle, no per-row generated code to compile, identical
  * longs (parity-spec'd against the HOF baseline, hash-matched by
  * the DuckDB oracle).
  */
case class MinHashMd5Expr(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_md5 requires array<string> input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashOps.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashOps.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashOps {

  final val P = 2147483647L // 2^31 - 1; (a·h + b) < 2^62 stays exact in int64

  def affineA(i: Int): Long = 1103515245L + 12345L * i
  def affineB(i: Int): Long = 6789L + 10007L * i

  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      val d = md.digest(
        shingles.getUTF8String(s).toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h >>> 4) % P // first 15 hex chars = leading 60 bits, then mod p
      var i = 0
      while (i < numHashes) {
        val v = (affineA(i) * h + affineB(i)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }
}

object MinHashMd5Expr {
  def minhashSig(shingles: Column, numHashes: Int): Column =
    GraftSqlShim.column(MinHashMd5Expr(GraftSqlShim.expression(shingles), numHashes))
}
