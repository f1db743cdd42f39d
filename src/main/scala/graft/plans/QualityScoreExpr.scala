package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass hashed-linear-classifier kernel (the C41 hot path):
  * (n_features, logit_milli) of a document in ONE O(len) scan — no
  * term explode, no shuffle at all until the caller aggregates its
  * own outputs.
  *
  * The composed formulation
  * ([[graft.ops.QualityClassifier.score]]'s explode path) ships every
  * unigram+bigram term through an exploded row and a per-doc hash
  * aggregation: O(tokens) rows into an exchange. This kernel folds
  * the whole feature sum into the row it came from, turning the
  * classifier into a pure narrow map — on 100 TB the difference is an
  * exchange of 2×tokens small rows per document versus none.
  * Semantics are verified against the composed path bit for bit
  * (same md5-derived buckets and milli-weights, see
  * QualityClassifierSpec).
  */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_score requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = QualityScoreOps.schema

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    QualityScoreOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.QualityScoreOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityScoreOps {

  val schema: StructType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("logit_milli", LongType, nullable = false)))

  final val Buckets = 1024L

  /** First 60 bits of md5(s) as a non-negative long — identical to
    * Dedup.md5Hash60 / DuckDB `('0x'||substr(md5(s),1,15))::BIGINT`.
    */
  private def h60(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h >>> 4
  }

  /** Deterministic per-bucket milli-weight, identical to
    * QualityClassifier.weightMilli. Buckets is small, so the 1024
    * weights are precomputed once per JVM.
    */
  private lazy val weights: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Buckets.toInt)(b => h60(md, "qw:" + b) % 2001L - 1000L)
  }

  def compute(text: UTF8String): GenericInternalRow = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // Exact parity with the composed split(trim(lower(text)), "\\s+")
    // path: UTF8String.toLowerCase is locale-independent (Java
    // String.toLowerCase is not), UTF8String.trim strips ONLY
    // 0x20 (Java trims all <= 0x20, e.g. trailing \n), and Spark's
    // split keeps trailing empty strings (Java's default drops them).
    val tokens = text.toLowerCase.trim.toString.split("\\s+", -1)
    var n = 0L
    var logit = 0L
    var i = 0
    while (i < tokens.length) {
      logit += weights(((h60(md, tokens(i)) % Buckets)).toInt)
      n += 1
      if (i + 1 < tokens.length) {
        logit += weights(((h60(md, tokens(i) + " " + tokens(i + 1)) % Buckets)).toInt)
        n += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, logit))
  }
}

object QualityScoreExpr {
  /** Column API for the kernel. */
  def qualityStats(text: Column): Column =
    GraftSqlShim.column(QualityScoreExpr(GraftSqlShim.expression(text)))
}
