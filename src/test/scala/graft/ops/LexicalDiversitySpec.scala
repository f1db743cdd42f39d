package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C145 lexical diversity: exact hand-computed TTR/hapax/Simpson
  * values, degenerate groups, and tokenization normalization.
  */
class LexicalDiversitySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    LexicalDiversity.perGroup(rows.toDF("source", "text"), col("source"), col("text"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap

  test("hand case: concentrated vs all-hapax groups") {
    val m = run(Seq(("A", "a a a b"), ("B", "x y z")))
    val a = m("A")
    // f = {a:3, b:1}: N=4, V=2, hapax=1, sum f(f-1)=6
    assert(a.getAs[Long]("n_tokens") == 4L)
    assert(a.getAs[Long]("n_types") == 2L)
    assert(a.getAs[Long]("n_hapax") == 1L)
    assert(a.getAs[Long]("ttr_milli") == 500L)
    assert(a.getAs[Long]("simpson_micro") == 500000L) // 6e6 / 12
    val b = m("B")
    assert(b.getAs[Long]("ttr_milli") == 1000L)
    assert(b.getAs[Long]("n_hapax") == 3L)
    assert(b.getAs[Long]("simpson_micro") == 0L)
  }

  test("single-token group: TTR 1000, Simpson undefined (NULL)") {
    val m = run(Seq(("S", "solo"), ("T", "two two")))
    val s = m("S")
    assert(s.getAs[Long]("n_tokens") == 1L)
    assert(s.getAs[Long]("ttr_milli") == 1000L)
    assert(s.isNullAt(s.fieldIndex("simpson_micro")))
    // "two two": N=2, V=1, sum f(f-1)=2 -> 2e6/2 = 1e6 (certain repeat)
    assert(m("T").getAs[Long]("simpson_micro") == 1000000L)
  }

  test("an empty-text group produces no row (no phantom zero-token groups)") {
    val m = run(Seq(("E", "   "), ("F", "ok fine")))
    assert(!m.contains("E"))
    assert(m.contains("F"))
  }

  test("tokenization folds case and splits on any whitespace run") {
    val m = run(Seq(("C", "Word word\t WORD")))
    assert(m("C").getAs[Long]("n_types") == 1L)
    assert(m("C").getAs[Long]("n_tokens") == 3L)
  }
}
