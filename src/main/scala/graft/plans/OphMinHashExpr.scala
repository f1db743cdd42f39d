package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-permutation MinHash signature (Li, Owen & Zhang 2012) with
  * rotation densification (Shrivastava & Li 2014): ONE md5 per
  * shingle — the hash value itself selects its bin (`h mod k`) and
  * competes for that bin's minimum; empty bins borrow the value of
  * the next non-empty bin clockwise. Classic k-hash MinHash
  * ([[MinHashMd5Expr]]) evaluates k affine maps per shingle — at
  * 100 TB the signature pass is hash-CPU-bound and OPH cuts that
  * k-fold while keeping the same unbiased Jaccard estimator
  * (E[sig_a == sig_b] ≈ J(a,b)), which is why it is the production
  * scale path for corpus-wide near-dup.
  *
  * Portability: the per-shingle base hash is the same md5-60-bit
  * `mod p` device as the classic kernel, bins and densification are
  * integer arithmetic — the DuckDB twin reproduces every long
  * exactly. Documents with no shingles at all emit `p` in every bin
  * (no shingle hash can equal p, so empty docs never collide with
  * real ones).
  */
case class OphMinHashExpr(child: Expression, numBins: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"oph_minhash requires array<string> input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    OphMinHashOps.compute(input.asInstanceOf[ArrayData], numBins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.OphMinHashOps.compute($c, $numBins)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OphMinHashOps {

  /** Same modulus as the classic portable family ([[MinHashOps.P]]). */
  final val P = MinHashOps.P

  def compute(shingles: ArrayData, numBins: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bins = new Array[Long](numBins)
    java.util.Arrays.fill(bins, Long.MaxValue)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      val d = md.digest(
        shingles.getUTF8String(s).toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h >>> 4) % P // first 15 hex chars = leading 60 bits, then mod p
      val bin = (h % numBins).toInt
      if (h < bins(bin)) bins(bin) = h
      s += 1
    }
    // rotation densification: empty bin i borrows from the first
    // non-empty bin clockwise; all-empty (no shingles) -> p sentinel
    val out = new Array[Long](numBins)
    var i = 0
    while (i < numBins) {
      var j = 0
      var v = Long.MaxValue
      while (j < numBins && v == Long.MaxValue) {
        v = bins((i + j) % numBins)
        j += 1
      }
      out(i) = if (v == Long.MaxValue) P else v
      i += 1
    }
    new GenericArrayData(out)
  }
}

object OphMinHashExpr {
  def signature(shingles: Column, numBins: Int): Column =
    GraftSqlShim.column(OphMinHashExpr(GraftSqlShim.expression(shingles), numBins))
}
