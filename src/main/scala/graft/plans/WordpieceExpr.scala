package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (WordPiece-style)
  * against a fixed vocabulary — the real token accounting a training
  * pipeline budgets with (C10's regex count is a proxy).
  *
  * Per lowercased whitespace word: the longest vocabulary prefix is
  * taken, then the longest `##`-continuation piece, repeatedly; a
  * word with no match at some position collapses to one `[UNK]`.
  * The vocabulary is compiled once per expression instance into a
  * length-bucketed hash set and shipped to executors as a codegen
  * reference object; the per-row cost is O(word·maxPieceLen) with
  * zero allocation beyond the output. Codegen emits a single static
  * call, keeping the stage inside whole-stage codegen.
  *
  * Counting is the hot path ([[WordpieceCountExpr]], bigint); the
  * pieces variant ([[WordpieceTokensExpr]]) exists for inspection
  * and specs.
  */
object WordpieceOps {

  /** Longest-match vocabulary: entries bucketed by surface form;
    * `maxLen` bounds the backward scan.
    */
  final class Vocab(entries: Seq[String]) extends Serializable {
    val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](entries.size * 2)
      entries.foreach(e => s.add(e))
      s
    }
    val maxLen: Int = if (entries.isEmpty) 0 else entries.map(_.length).max
  }

  /** Tokenize one word; appends pieces to `out`. Returns piece count. */
  private def tokenizeWord(word: String, vocab: Vocab, out: mutable.Buffer[String]): Int = {
    var start = 0
    var n = 0
    val mark = out.size
    while (start < word.length) {
      val prefix = if (start == 0) "" else "##"
      // longest piece first: end bounded by vocab.maxLen surface chars
      var end = math.min(word.length, start + math.max(1, vocab.maxLen - prefix.length))
      var found: String = null
      while (end > start && found == null) {
        val cand = prefix + word.substring(start, end)
        if (vocab.set.contains(cand)) found = cand else end -= 1
      }
      if (found == null) {
        // unknown: the whole word is one [UNK], discard partial pieces
        out.remove(mark, out.size - mark)
        out += "[UNK]"
        return 1
      }
      out += found
      n += 1
      start = end
    }
    if (n == 0) { out += "[UNK]"; n = 1 } // empty word guard
    n
  }

  def tokens(text: UTF8String, vocab: Vocab): ArrayData = {
    val out = mutable.ArrayBuffer.empty[String]
    text.toString.toLowerCase.trim.split("\\s+").foreach { w =>
      if (w.nonEmpty) tokenizeWord(w, vocab, out)
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  def count(text: UTF8String, vocab: Vocab): Long = {
    var n = 0L
    val scratch = mutable.ArrayBuffer.empty[String]
    text.toString.toLowerCase.trim.split("\\s+").foreach { w =>
      if (w.nonEmpty) { scratch.clear(); n += tokenizeWord(w, vocab, scratch) }
    }
    n
  }
}

trait WordpieceBase extends UnaryExpression {
  def vocabulary: Seq[String]

  @transient protected lazy val vocab = new WordpieceOps.Vocab(vocabulary)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wordpiece requires string input, got ${child.dataType.simpleString}")

  override def nullIntolerant: Boolean = true

  protected def genCall(ctx: CodegenContext, ev: ExprCode, method: String): ExprCode = {
    val vocabRef = ctx.addReferenceObj("wpVocab", vocab,
      classOf[WordpieceOps.Vocab].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.WordpieceOps.$method($c, $vocabRef)")
  }
}

case class WordpieceCountExpr(child: Expression, vocabulary: Seq[String])
    extends WordpieceBase {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    WordpieceOps.count(input.asInstanceOf[UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "count")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordpieceTokensExpr(child: Expression, vocabulary: Seq[String])
    extends WordpieceBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WordpieceOps.tokens(input.asInstanceOf[UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "tokens")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordpieceExpr {
  def count(text: Column, vocabulary: Seq[String]): Column =
    GraftSqlShim.column(WordpieceCountExpr(GraftSqlShim.expression(text), vocabulary))
  def tokens(text: Column, vocabulary: Seq[String]): Column =
    GraftSqlShim.column(WordpieceTokensExpr(GraftSqlShim.expression(text), vocabulary))
}
