package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Unicode-script composition kernel: per document,
  * codepoint counts by script family (Latin, CJK, Cyrillic, Arabic,
  * Devanagari, Hangul, digits, whitespace, other) — the multilingual
  * curation gate the stopword langid (C8) cannot provide: langid
  * answers "which language wins", script mix answers "is this
  * document even one script" (mixed-script spam, mojibake, wrong-
  * script injection inside a claimed-English crawl all show up here
  * first). Counts are exact integers; classification is by codepoint
  * RANGE, so the DuckDB twin reproduces every count with the same
  * CASE ranges over `unicode(ch)`.
  *
  * One O(len) scan per row inside whole-stage codegen; nothing
  * shuffles (the per-char explode formulation exchanges every
  * character of the corpus — the C83 argument).
  */
case class ScriptMixExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"script_mix requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ScriptMixOps.schema

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ScriptMixOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ScriptMixOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScriptMixOps {

  val fields: Seq[String] = Seq("n_total", "n_latin", "n_cjk", "n_cyrillic",
    "n_arabic", "n_devanagari", "n_hangul", "n_digit", "n_space", "n_other")

  val schema: StructType =
    StructType(fields.map(f => StructField(f, LongType, nullable = false)))

  /** Codepoint-range classification — mirrored VERBATIM by
    * [[scriptCaseSql]]; keep the two in sync.
    */
  def classify(cp: Int): Int =
    if (cp >= 48 && cp <= 57) 7 // ASCII digits
    else if (cp == 32 || cp == 9 || cp == 10 || cp == 13) 8 // whitespace
    else if ((cp >= 65 && cp <= 90) || (cp >= 97 && cp <= 122) ||
      (cp >= 0xC0 && cp <= 0x24F)) 1 // Latin incl. supplements/extended
    else if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
      (cp >= 0x3040 && cp <= 0x30FF)) 2 // CJK unified + ext-A + kana
    else if (cp >= 0x400 && cp <= 0x4FF) 3 // Cyrillic
    else if ((cp >= 0x600 && cp <= 0x6FF) || (cp >= 0x750 && cp <= 0x77F)) 4 // Arabic
    else if (cp >= 0x900 && cp <= 0x97F) 5 // Devanagari
    else if ((cp >= 0xAC00 && cp <= 0xD7AF) || (cp >= 0x1100 && cp <= 0x11FF)) 6 // Hangul
    else 9 // other

  /** One pass over the string's codepoints. Empty text → all zeros. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new Array[Long](10)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts(0) += 1
      val cls = classify(cp)
      if (cls > 0) counts(cls) += 1
      i += Character.charCount(cp)
    }
    new GenericInternalRow(counts.map(c => c: Any))
  }

  /** DuckDB CASE over `unicode($ch)` emitting the same class index —
    * the twin of [[classify]].
    */
  def scriptCaseSql(ch: String): String =
    s"""CASE
       |  WHEN unicode($ch) BETWEEN 48 AND 57 THEN 7
       |  WHEN unicode($ch) IN (32, 9, 10, 13) THEN 8
       |  WHEN unicode($ch) BETWEEN 65 AND 90 OR unicode($ch) BETWEEN 97 AND 122
       |    OR unicode($ch) BETWEEN 192 AND 591 THEN 1
       |  WHEN unicode($ch) BETWEEN 19968 AND 40959 OR unicode($ch) BETWEEN 13312 AND 19903
       |    OR unicode($ch) BETWEEN 12352 AND 12543 THEN 2
       |  WHEN unicode($ch) BETWEEN 1024 AND 1279 THEN 3
       |  WHEN unicode($ch) BETWEEN 1536 AND 1791 OR unicode($ch) BETWEEN 1872 AND 1919 THEN 4
       |  WHEN unicode($ch) BETWEEN 2304 AND 2431 THEN 5
       |  WHEN unicode($ch) BETWEEN 44032 AND 55215 OR unicode($ch) BETWEEN 4352 AND 4607 THEN 6
       |  ELSE 9 END""".stripMargin
}

object ScriptMixExprOps {
  def mix(text: Column): Column =
    GraftSqlShim.column(ScriptMixExpr(GraftSqlShim.expression(text)))
}
