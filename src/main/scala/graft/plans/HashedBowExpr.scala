package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document hashing-trick histogram kernel: whitespace tokens →
  * bucket = md5₆₀(token) mod dim → (bucket, cnt) pairs in ascending
  * bucket order, all inside one codegen'd call.
  *
  * The composed C70 pipeline (explode tokens → project (doc, bucket)
  * → groupBy(doc, bucket).count) shuffles the corpus token stream to
  * rebuild a histogram that is PER-DOCUMENT by definition — the
  * grouping key contains the row's own id, so no cross-row combine
  * ever happens and the exchange is pure overhead. Computing the
  * histogram in-row turns every hashedBow consumer (perceptron
  * train/score, OVA, cross-val label noise, source ablation, active
  * selection) from explode+shuffle+agg into explode-of-small-arrays
  * with ZERO shuffle — on a 100 TB corpus the difference between a
  * narrow map and exchanging 10^12 token rows.
  *
  * Bucket values are bit-identical to the composition (same
  * md5Hash60 mod, same empty-token filter), so every downstream
  * join/fit is unchanged — parity spec-pinned in HashedBowExprSpec.
  */
case class HashedBowExpr(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_bow requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = HashedBowOps.schema

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashedBowOps.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashedBowOps.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedBowOps {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  // Reused per-task scratch (tasks are single-threaded; the
  // Md5Hash60Ops thread-local digest is the precedent). Counting
  // array + touched list amortize to zero allocation per row for the
  // common small dims; dims past the cap fall back to a per-row map.
  private final val DenseDimCap = 1 << 16
  private final class Scratch(val dim: Int) {
    val counts = new Array[Long](dim)
    val touched = new Array[Int](dim)
  }
  private val scratch = new ThreadLocal[Scratch]

  def compute(text: UTF8String, dim: Int): ArrayData = {
    val s = text.toLowerCase.trim().toString
    val tokens = Ws.split(s, -1)
    if (dim > DenseDimCap) return computeSparse(tokens, dim)
    var sc = scratch.get()
    if (sc == null || sc.dim != dim) { sc = new Scratch(dim); scratch.set(sc) }
    val counts = sc.counts
    val touched = sc.touched
    var nTouched = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (!t.isEmpty) { // the composition filters empty tokens
        val b = (Md5Hash60Ops.hash60(UTF8String.fromString(t)) % dim).toInt
        if (counts(b) == 0L) { touched(nTouched) = b; nTouched += 1 }
        counts(b) += 1L
      }
      i += 1
    }
    java.util.Arrays.sort(touched, 0, nTouched) // deterministic ascending-bucket order
    val out = new Array[Any](nTouched)
    i = 0
    while (i < nTouched) {
      val b = touched(i)
      out(i) = new GenericInternalRow(Array[Any](b.toLong, counts(b))): InternalRow
      counts(b) = 0L // zero only what we touched
      i += 1
    }
    new GenericArrayData(out)
  }

  private def computeSparse(tokens: Array[String], dim: Int): ArrayData = {
    val m = new java.util.TreeMap[java.lang.Long, Long]()
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (!t.isEmpty) {
        val b = java.lang.Long.valueOf(Md5Hash60Ops.hash60(UTF8String.fromString(t)) % dim)
        m.merge(b, 1L, (a, c) => a + c)
      }
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey.longValue(), e.getValue)): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }
}

object HashedBowExpr {
  def hashedBow(text: Column, dim: Int): Column =
    GraftSqlShim.column(HashedBowExpr(GraftSqlShim.expression(text), dim))
}
