package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization kernel (C71): NFC/NFKC/NFD/NFKD via
  * `java.text.Normalizer`, exposed as a codegen'd narrow map.
  *
  * Why it matters for corpus prep: web text mixes precomposed and
  * combining-mark encodings of the SAME string ("é" as U+00E9 vs
  * e+U+0301), so every downstream hash key — exact dedup (C1),
  * normalized dedup (C65), shingles, token counts — silently treats
  * equal text as different until the corpus is canonicalized. The
  * reference stack gets this from DuckDB's `nfc_normalize`
  * (py-gtfs-duckdb leans on DuckDB builtins for all string hygiene);
  * Spark has no normalizer builtin, hence this expression.
  *
  * Scale shape: a pure per-row map — no shuffle, no state, stays
  * inside WholeStageCodegen via [[doGenCode]]. The common case
  * (already-normalized ASCII/NFC text) is a single `isNormalized`
  * scan that returns the INPUT UTF8String untouched — zero
  * allocation; only genuinely denormalized rows pay the
  * decompose/recompose.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize requires string input, got ${child.dataType.simpleString}")
    else if (!UnicodeNormalizeOps.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' (expected one of ${UnicodeNormalizeOps.Forms.mkString(", ")})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeOps.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.plans.UnicodeNormalizeOps.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalizeOps {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = Normalizer.Form.valueOf(form)
    // fast path: already-normalized text (the overwhelming majority of
    // any real corpus) returns the input buffer untouched
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  /** Canonical composition — DuckDB twin: `nfc_normalize(x)`. */
  def nfc(c: Column): Column =
    GraftSqlShim.column(UnicodeNormalizeExpr(GraftSqlShim.expression(c), "NFC"))

  /** Compatibility composition (folds ligatures/width/super-scripts —
    * ﬁ→fi, ２→2); the form LM tokenizer pipelines usually want. No
    * DuckDB builtin twin exists, so C71's oracle runs on [[nfc]] and
    * NFKC is spec-covered.
    */
  def nfkc(c: Column): Column =
    GraftSqlShim.column(UnicodeNormalizeExpr(GraftSqlShim.expression(c), "NFKC"))
}
