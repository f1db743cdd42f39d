package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CdcApplySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val snap = Seq(
    (1L, "alice", 10L), (2L, "bob", 20L), (3L, "carol", 30L), (4L, "dave", 40L)
  ).toDF("k", "name", "bal")

  test("cdc apply: upsert replaces, delete drops, insert adds, untouched pass through") {
    val log = Seq(
      (2L, 1L, "U", Some("bobby"), Some(21L)),   // update bob
      (3L, 1L, "D", None, None),                 // delete carol
      (9L, 1L, "U", Some("nina"), Some(90L))     // insert new key
    ).toDF("k", "version", "op", "name", "bal")
      .select(col("k"), col("version"), col("op"),
        col("name"), col("bal"))

    val got = CdcApply.apply(snap, log, "k", "version", "op", Seq("name", "bal"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (("alice", 10L)), 2L -> (("bobby", 21L)),
      4L -> (("dave", 40L)), 9L -> (("nina", 90L))))
  }

  test("cdc collapse: latest version wins; a delete beats an upsert at the same version") {
    val log = Seq(
      (1L, 1L, "U", Some("a1")), (1L, 3L, "U", Some("a3")), (1L, 2L, "U", Some("a2")),
      (2L, 5L, "U", Some("b5")), (2L, 5L, "D", Option.empty[String]),
      (4L, 1L, "D", Option.empty[String]), (4L, 2L, "U", Some("d2"))  // resurrect after delete
    ).toDF("k", "version", "op", "name")

    val got = CdcApply.apply(snap, log, "k", "version", "op", Seq("name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a3", 3L -> "carol", 4L -> "d2"))
  }

  test("cdc apply: replace semantics — an upsert's null field nulls the column") {
    val log = Seq((1L, 1L, "U", Option.empty[String])).toDF("k", "version", "op", "name")
    val got = CdcApply.apply(snap, log, "k", "version", "op", Seq("name"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).isEmpty && got(2L).contains("bob"))
  }
}
