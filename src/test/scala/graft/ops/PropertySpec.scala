package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.gtfs.GtfsLake

/** Randomized equivalence checks: the distributed operators must
  * agree with naive in-memory reference implementations on arbitrary
  * small inputs. Deterministic seeds — failures reproduce.
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  // --- as-of join vs naive quadratic reference ---------------------
  test("asof join agrees with the quadratic reference on random data") {
    val evGen = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        t <- Gen.choose(0L, 20L)
      } yield (k, t))
    } yield rows
    for (seed <- 1L to 8L) {
      val leftRows = sample(evGen, seed).zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rightRows = sample(evGen, seed + 100).zipWithIndex.map { case ((k, t), i) => (i.toLong + 1000, k, t) }
      val left = leftRows.toDF("lid", "k", "t")
      val right = rightRows.toDF("rid", "k", "t")
      val got = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "t", Seq("t"), "rid")
        .select(col("lid"), col("asof_match.rid"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val expect = leftRows.map { case (lid, k, t) =>
        val cands = rightRows.filter(r => r._2 == k && r._3 <= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(c => (c._3, c._1))._1))
      }.toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  // --- upsert laws -------------------------------------------------
  test("upsert: delta wins, base-only rows survive, idempotent") {
    val rowGen = for {
      n <- Gen.choose(0, 30)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0, 15)
        v <- Gen.alphaStr.map(_.take(5))
      } yield (k.toLong, v))
    } yield rows.distinctBy(_._1)
    for (seed <- 1L to 8L) {
      val baseRows = sample(rowGen, seed)
      val deltaRows = sample(rowGen, seed + 55)
      val base = baseRows.toDF("k", "v")
      val delta = deltaRows.toDF("k", "v")
      val merged = GtfsLake.upsert(base, delta, Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = (baseRows.toMap ++ deltaRows.toMap)
      assert(merged == expect, s"seed=$seed")
      // idempotent: re-applying the delta changes nothing
      val again = GtfsLake.upsert(merged.toSeq.toDF("k", "v"), delta, Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(again == expect, s"seed=$seed (idempotence)")
    }
  }

  // --- exact dedup vs naive ---------------------------------------
  test("exact dedup agrees with naive grouping on random documents") {
    val docGen = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, Gen.oneOf("x", "y", "zz", "qqq", "", " "))
    } yield rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for (seed <- 1L to 8L) {
      val rows = sample(docGen, seed)
      if (rows.nonEmpty) {
        val df = rows.toDF("doc_id", "text")
        val got = Dedup.exact(df, col("doc_id"), col("text"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val expect = rows.groupBy(_._2).map { case (_, g) =>
          g.map(_._1).min -> g.size.toLong
        }
        assert(got == expect, s"seed=$seed")
      }
    }
  }

  // --- latest-state vs naive --------------------------------------
  test("latest-state agrees with naive max-by on random updates") {
    val updGen = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("e1", "e2", "e3")
        ts <- Gen.choose(0L, 10L)
        v <- Gen.choose(0, 999)
      } yield (k, ts, v.toLong))
    } yield rows
    for (seed <- 1L to 8L) {
      val rows = sample(updGen, seed)
      val df = rows.toDF("k", "ts", "v")
      val got = graft.streaming.LatestState.latest(df, Seq("k"), col("ts"), col("v"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val expect = rows.groupBy(_._1).map { case (k, g) =>
        val best = g.maxBy(r => (r._2, r._3))
        k -> (best._2, best._3)
      }
      assert(got == expect, s"seed=$seed")
    }
  }
}
