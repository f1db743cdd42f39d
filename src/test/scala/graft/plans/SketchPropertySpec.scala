package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the sketch kernels, checked JVM-locally on
  * random data and RANDOM PARTITION SPLITS — the invariant that makes
  * distributed partial/merge correct regardless of how Spark happens
  * to partition the data.
  */
class SketchPropertySpec extends AnyFunSuite {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private val itemsGen = for {
    n <- Gen.choose(0, 5000)
    xs <- Gen.listOfN(n, Gen.choose(0L, 800L)) // duplicates likely
  } yield xs

  private def splits[A](xs: List[A], seed: Long): List[List[A]] = {
    val nSplits = 1 + (seed % 7).toInt
    xs.zipWithIndex.groupBy { case (_, i) => (i * 31 + seed) % nSplits }
      .values.map(_.map(_._1)).toList
  }

  test("hll: merging per-split registers equals building one sketch (any split)") {
    for (seed <- 1L to 20L) {
      val xs = sample(itemsGen, seed)
      val p = 8
      val direct = new Array[Byte](1 << p)
      xs.foreach(x => HllSketch.updateRegisters(direct,
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          x, org.apache.spark.sql.types.LongType, 42L), p))
      val merged = splits(xs, seed).map { part =>
        val regs = new Array[Byte](1 << p)
        part.foreach(x => HllSketch.updateRegisters(regs,
          org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
            x, org.apache.spark.sql.types.LongType, 42L), p))
        regs
      }.foldLeft(new Array[Byte](1 << p))(HllSketch.mergeRegisters)
      assert(java.util.Arrays.equals(direct, merged), s"seed $seed")
    }
  }

  test("theta: merging per-split value sets equals building one sketch (any split)") {
    for (seed <- 1L to 20L) {
      val xs = sample(itemsGen, seed)
      val k = 64
      def build(part: List[Long]): ThetaSketch.Buffer = {
        val b = ThetaSketch.newBuffer()
        part.foreach(x => ThetaSketch.insert(b, k,
          ThetaSketch.hash63(x, org.apache.spark.sql.types.LongType)))
        b
      }
      val direct = build(xs)
      val merged = splits(xs, seed).map(build)
        .foldLeft(ThetaSketch.newBuffer())((a, b) => ThetaSketch.mergeInto(a, k, b))
      assert(ThetaSketch.serialize(direct, k).toSeq == ThetaSketch.serialize(merged, k).toSeq,
        s"seed $seed")
    }
  }

  test("freq: heavy-hitter guarantee survives random splits and merges") {
    for (seed <- 1L to 20L) {
      val xs = sample(itemsGen, seed).map(x => s"i${x % 50}") // concentrated
      if (xs.nonEmpty) {
        val k = 12
        def build(part: List[String]): FreqSketch.Counters = {
          val c = FreqSketch.newCounters()
          part.foreach(FreqSketch.offer(c, k, _))
          c
        }
        val merged = splits(xs, seed).map(build)
          .foldLeft(FreqSketch.newCounters())((a, b) => FreqSketch.mergeInto(a, k, b))
        val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = xs.size
        // every item with true count > 2n/k must be tracked (the
        // merged-summary guarantee is 2n/k: n/k from the MG pass +
        // n/k from the merge trims), and no count is overestimated
        exact.foreach { case (item, cnt) =>
          if (cnt > 2.0 * n / k)
            assert(merged.contains(item), s"seed $seed lost $item ($cnt of $n)")
        }
        merged.foreach { case (item, est) =>
          assert(est <= exact(item), s"seed $seed overestimated $item")
          assert(est >= exact(item) - 2.0 * n / k, s"seed $seed undercount beyond bound for $item")
        }
      }
    }
  }

  test("quantile: rank error within bound under random splits and merges") {
    val valuesGen = for {
      n <- Gen.choose(100, 4000)
      xs <- Gen.listOfN(n, Gen.choose(-1e6, 1e6))
    } yield xs
    for (seed <- 1L to 10L) {
      val xs = sample(valuesGen, seed)
      val k = 200
      def build(part: List[Double]): QuantileSketch.Buffer = {
        val b = new QuantileSketch.Buffer
        part.foreach(QuantileSketch.insert(b, k, _))
        b
      }
      val merged = splits(xs, seed).map(build)
        .foldLeft(new QuantileSketch.Buffer)((a, b) => QuantileSketch.mergeInto(a, k, b))
      val sorted = xs.sorted.toArray
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val est = QuantileSketch.query(merged, q)
        val rank = sorted.count(_ <= est).toDouble / sorted.length
        assert(math.abs(rank - q) < 0.08, s"seed $seed q=$q rank=$rank")
      }
    }
  }
}
