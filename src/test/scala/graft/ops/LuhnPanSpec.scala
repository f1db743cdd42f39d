package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C137: Luhn-validated PAN audit — the checksum separates real card
  * numbers from same-shaped digit noise.
  */
class LuhnPanSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def audit(rows: Seq[(Long, String)]) =
    TextCleaner.luhnPanAudit(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), Option(r.getString(4)))))
      .toMap

  test("valid PANs pass, near-misses fail, masking keeps last four") {
    val res = audit(Seq(
      // classic checksum-valid test numbers (13, 15, 16 digits)
      (1L, "card 4111111111111111 on file"),
      (2L, "amex 378282246310005 and visa13 4222222222222"),
      // same shape, last digit off — candidates but NOT valid
      (3L, "fake 4111111111111112 noise"),
      // too short / too long digit runs are not candidates
      (4L, "short 123456789012 long 123456789012345678901 end"),
      (5L, "no digits at all")))
    assert(res(1L) == ((1L, 1L, 1, Some("************1111"))))
    assert(res(2L)._1 == 2L && res(2L)._2 == 2L && res(2L)._3 == 1)
    assert(res(2L)._4.contains("***********0005"))
    assert(res(3L) == ((1L, 0L, 0, None)))
    // the 21-digit run is too long for a candidate; the 12-digit too
    // short — neither counted
    assert(res(4L) == ((0L, 0L, 0, None)))
    assert(res(5L) == ((0L, 0L, 0, None)))
  }

  test("luhn checksum matches the textbook algorithm on generated numbers") {
    def luhnRef(s: String): Boolean = {
      val ds = s.reverse.map(_ - '0')
      ds.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum % 10 == 0
    }
    val rnd = new scala.util.Random(7)
    val nums = (0 until 40).map { _ =>
      val len = 13 + rnd.nextInt(7)
      (1 to len).map(_ => rnd.nextInt(10)).mkString
    }
    val df = nums.zipWithIndex.map { case (s, i) => (i.toLong, s"x $s y") }
    val res = audit(df)
    nums.zipWithIndex.foreach { case (s, i) =>
      val expected = if (luhnRef(s)) 1L else 0L
      assert(res(i.toLong)._2 == expected, s"disagree on $s")
    }
  }

  test("distributed over a corpus column: zero-shuffle plan") {
    val df = (1 to 100).map(i => (i.toLong, s"t $i 4111111111111111")).toDF("doc_id", "text")
      .repartition(8)
    val out = TextCleaner.luhnPanAudit(df, col("doc_id"), col("text"))
    assert(out.count() == 100)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(400))
  }
}
