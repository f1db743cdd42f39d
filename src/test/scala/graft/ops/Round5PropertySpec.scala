package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized law checks for the round-5 operators, against naive
  * in-memory references. Deterministic seeds — failures reproduce.
  */
class Round5PropertySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  // --- CDC laws ----------------------------------------------------

  private val logGen = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 12L)
      v <- Gen.choose(1L, 6L)
      del <- Gen.oneOf(true, false)
      payload <- Gen.alphaStr.map(_.take(4))
    } yield (k, v, if (del) "D" else "U", payload))
    // one row per (key, version, op): the collapse's tie order below
    // (version, delete-wins) is total only up to the payload
  } yield rows.distinctBy(c => (c._1, c._2, c._3))

  test("cdc apply agrees with a naive per-key replay on random logs, and is idempotent") {
    val snapRows = (0L to 9L).map(k => (k, s"base$k"))
    for (seed <- 1L to 10L) {
      val logRows = sample(logGen, seed)
      val snap = snapRows.toDF("k", "name")
      val log = logRows.toDF("k", "version", "op", "name")

      val got = CdcApply.apply(snap, log, "k", "version", "op", Seq("name"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

      // naive replay: per key, pick max (version, delete-wins); apply
      val expect = (snapRows.map(_._1) ++ logRows.map(_._1)).distinct.flatMap { k =>
        val chs = logRows.filter(_._1 == k)
        val base = snapRows.find(_._1 == k).map(_._2)
        if (chs.isEmpty) base.map(b => k -> Option(b))
        else {
          val (_, _, op, payload) = chs.maxBy(c => (c._2, c._3 == "D"))
          if (op == "D") None else Some(k -> Option(payload))
        }
      }.toMap
      assert(got == expect, s"seed=$seed")

      // idempotence: re-applying the same log to the result is a no-op
      val again = CdcApply.apply(
        CdcApply.apply(snap, log, "k", "version", "op", Seq("name")),
        log, "k", "version", "op", Seq("name"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(again == got, s"idempotence seed=$seed")
    }
  }

  // --- equi-depth invariants --------------------------------------

  test("equi-depth: totals preserved, buckets ordered and value-disjoint on random data") {
    val dataGen = for {
      n <- Gen.choose(1, 300)
      rows <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield rows
    for (seed <- 1L to 10L) {
      val rows = sample(dataGen, seed)
      val got = EquiDepth.histogram(rows.toDF("x"), col("x"), buckets = 7)
        .orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      assert(got.map(_._2).sum == rows.size, s"seed=$seed")
      // buckets cover disjoint, increasing value ranges
      got.sliding(2).foreach {
        case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 < lo2, s"seed=$seed")
        case _ =>
      }
      // no bucket id outside [0, buckets)
      assert(got.forall(b => b._1 >= 0 && b._1 < 7), s"seed=$seed")
    }
  }

  // --- rate limit laws ---------------------------------------------

  test("rate limit: never more than n per key-hour, and kept set is the earliest") {
    val evGen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 4L)
        minute <- Gen.choose(0, 179)
      } yield (u, minute))
    } yield rows
    for (seed <- 1L to 8L) {
      val rows = sample(evGen, seed).zipWithIndex.map { case ((u, m), i) =>
        (i.toLong, u, java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00"))
      }
      val kept = RateLimit.keepFirstNPerHour(
          rows.toDF("event_id", "user_id", "ts"),
          col("user_id"), col("ts"), col("event_id"), n = 3)
        .collect().map(r => r.getAs[Long]("event_id")).toSet

      val expect = rows.groupBy(r => (r._2, r._3.getTime / 3600000L)).values.flatMap { g =>
        g.sortBy(r => (r._3.getTime, r._1)).take(3).map(_._1)
      }.toSet
      assert(kept == expect, s"seed=$seed")
    }
  }

  // --- interleave laws ---------------------------------------------

  test("interleave: per-source ranks are a 1..n permutation and vkey is monotone in rank") {
    val dataGen = for {
      n <- Gen.choose(1, 120)
      rows <- Gen.listOfN(n, Gen.choose(1L, 500L))
    } yield rows.distinct.map(id => (s"s${id % 4}", id))
    for (seed <- 1L to 8L) {
      val rows = sample(dataGen, seed)
      val got = Mixing.interleave(rows.toDF("source", "doc_id"),
          col("source"), col("doc_id"), Map("s0" -> 1, "s1" -> 2, "s2" -> 3))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      got.groupBy(_._1).foreach { case (src, g) =>
        assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq, s"seed=$seed src=$src")
        // vkey strictly increases with rank inside a source
        val byRank = g.sortBy(_._3).map(_._4)
        assert(byRank.zip(byRank.tail).forall { case (a, b) => a < b }, s"seed=$seed src=$src")
      }
      assert(got.length == rows.length, s"seed=$seed")
    }
  }
}
