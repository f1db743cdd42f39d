package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase dictionary matching (C77): count EVERY occurrence
  * (overlapping included) of each phrase in a fixed dictionary with
  * ONE Aho–Corasick pass over the lowercased text — the
  * blocklist/filter-list primitive of corpus curation (bad-word and
  * spam-phrase screens, license-plate boilerplate detection), where a
  * regex alternation of thousands of literals blows up and per-phrase
  * `contains` scans cost O(phrases · text).
  *
  * The automaton (goto/fail/output links over a char-indexed trie) is
  * compiled once per expression instance and ships to executors as a
  * codegen reference object (the Wordpiece vocabulary device); the
  * per-row cost is O(text + matches) regardless of dictionary size,
  * inside whole-stage codegen, zero shuffle.
  *
  * Semantics are exact and engine-portable: occurrences at every
  * start position count (so "aa" occurs twice in "aaa"), which the
  * DuckDB twin reproduces with a position scan
  * (`substr(text, i, len(p)) = p` over `range`) — no regex, no
  * lookahead, bit-identical integers.
  */
object PhraseMatchOps {

  /** Char-keyed Aho–Corasick automaton over a phrase list. Nodes in
    * breadth-first arrays; `outCounts(state)` lists the dictionary
    * indexes of phrases ENDING at that state (via output links,
    * pre-flattened at build time so the scan never chases fail links
    * for output).
    */
  final class Automaton(val phrases: Seq[String]) extends Serializable {
    // trie as growable arrays
    private val next = new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
    private val fail = new java.util.ArrayList[Integer]()
    private val ends = new java.util.ArrayList[java.util.ArrayList[Integer]]()
    val outputs: Array[Array[Int]] = {
      def newNode(): Int = {
        next.add(new java.util.HashMap[Character, Integer]())
        fail.add(0)
        ends.add(new java.util.ArrayList[Integer]())
        next.size() - 1
      }
      newNode() // state 0 = root
      phrases.zipWithIndex.foreach { case (p, idx) =>
        var s = 0
        p.foreach { ch =>
          val m = next.get(s)
          if (!m.containsKey(ch)) m.put(ch, newNode())
          s = m.get(ch)
        }
        ends.get(s).add(idx)
      }
      // BFS fail links
      val queue = new java.util.ArrayDeque[Integer]()
      next.get(0).forEach((_, v) => { fail.set(v, 0); queue.add(v) })
      while (!queue.isEmpty) {
        val u = queue.poll()
        next.get(u).forEach { (ch, v) =>
          var f = fail.get(u).intValue()
          while (f != 0 && !next.get(f).containsKey(ch)) f = fail.get(f)
          val fNext = next.get(f)
          val cand = if (fNext.containsKey(ch)) fNext.get(ch).intValue() else 0
          // a root child's fallback-by-ch is itself — fail to root instead
          val target = if (cand == v.intValue()) 0 else cand
          fail.set(v, target)
          // flatten output links: everything the fail target emits
          ends.get(v).addAll(ends.get(target))
          queue.add(v)
        }
      }
      (0 until next.size()).map { s =>
        val e = ends.get(s)
        Array.tabulate(e.size())(i => e.get(i).intValue())
      }.toArray
    }

    /** goto with fail-link fallback. */
    def step(state: Int, ch: Char): Int = {
      var s = state
      while (true) {
        val m = next.get(s)
        val t = m.get(ch)
        if (t != null) return t.intValue()
        if (s == 0) return 0
        s = fail.get(s)
      }
      0
    }

    val nPhrases: Int = phrases.size
  }

  /** Per-phrase occurrence counts over lowercased text, dictionary
    * order. One automaton pass: O(text + matches).
    */
  def counts(text: UTF8String, auto: Automaton): ArrayData = {
    val out = new Array[Long](auto.nPhrases)
    val s = text.toLowerCase.toString
    var state = 0
    var i = 0
    while (i < s.length) {
      state = auto.step(state, s.charAt(i))
      val hits = auto.outputs(state)
      var h = 0
      while (h < hits.length) { out(hits(h)) += 1L; h += 1 }
      i += 1
    }
    new GenericArrayData(out.map(Long.box).toArray[Any])
  }
}

case class PhraseCountsExpr(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
    "phrase dictionary must be non-empty with non-empty phrases")

  @transient private lazy val auto = new PhraseMatchOps.Automaton(phrases.map(_.toLowerCase))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phrase_counts requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PhraseMatchOps.counts(input.asInstanceOf[UTF8String], auto)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAuto", auto,
      classOf[PhraseMatchOps.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.PhraseMatchOps.counts($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhraseMatchExpr {
  /** array<bigint> of per-phrase occurrence counts, dictionary order. */
  def counts(text: Column, phrases: Seq[String]): Column =
    GraftSqlShim.column(PhraseCountsExpr(GraftSqlShim.expression(text), phrases))
}
