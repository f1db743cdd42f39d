package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C139 dataset cartography: regions from the epoch-margin
  * trajectory, moment-sum exactness, trajectory/fit agreement.
  */
class CartographySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // a linearly separable "aye/nay" task plus one mislabeled doc: the
  // clean docs turn correct once the first update lands, the
  // mislabeled one never does
  private val docs = Seq(
    (1L, "aye aye aye", 1),
    (2L, "aye aye", 1),
    (3L, "nay nay nay", -1),
    (4L, "nay nay", -1),
    (5L, "aye aye aye aye", -1)) // label noise
  private val Dim = 16
  private val Epochs = 3

  private def df = docs.toDF("doc_id", "text", "y")

  test("regions and n_correct agree with the trajectory, and the zero start forbids 'easy'") {
    val got = Cartography.map(df, col("doc_id"), col("text"), col("y"), Dim, Epochs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_correct"), r.getAs[String]("region"))).toMap
    assert(got.size == 5)
    // recompute every doc's margins straight from the snapshots
    // (hash-collision-agnostic ground truth)
    val feats = Features.hashedBow(df, col("doc_id"), col("text"), Dim)
    val labels = df.select(col("doc_id"), col("y"))
    val snaps = Cartography.trajectory(feats, labels, Dim, Epochs)
    val fRows = feats.collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("cnt"))))
    docs.foreach { case (id, _, y) =>
      val margins = snaps.map { case (w, b) =>
        fRows(id).map { case (bk, c) => w(bk.toInt) * c }.sum + b }
      val nc = margins.count(m => y * m > 0).toLong
      val region = if (nc == Epochs) "easy" else if (nc == 0) "hard" else "ambiguous"
      assert(got(id) == ((nc, region)), s"doc $id: got ${got(id)}, expected ($nc, $region)")
      // epoch 1 sees the zero model: margin 0, never 'correct'
      assert(y * margins.head == 0 && region != "easy")
    }
  }

  test("trajectory matches fitPerceptron: last snapshot + one update == final model") {
    val feats = Features.hashedBow(df, col("doc_id"), col("text"), Dim)
    val labels = df.select(col("doc_id"), col("y"))
    val snaps = Cartography.trajectory(feats, labels, Dim, Epochs)
    assert(snaps.size == Epochs)
    assert(snaps.head._1.forall(_ == 0L) && snaps.head._2 == 0L) // zero start
    // the fit's final weights come from applying epoch `Epochs`'s
    // update to the last snapshot; re-fitting with epochs-1 must
    // reproduce the last snapshot exactly
    val prev = LinearClassifier.fitPerceptron(feats, labels, Dim, Epochs - 1)
    assert(prev.weights.toSeq == snaps.last._1.toSeq && prev.bias == snaps.last._2)
  }

  test("confidence/variability are the floored moment sums") {
    val m = Cartography.map(df, col("doc_id"), col("text"), col("y"), Dim, Epochs)
      .filter(col("doc_id") === 1L).collect()(0)
    // recompute from the trajectory by hand
    val feats = Features.hashedBow(df, col("doc_id"), col("text"), Dim)
    val labels = df.select(col("doc_id"), col("y"))
    val snaps = Cartography.trajectory(feats, labels, Dim, Epochs)
    val f1 = feats.filter(col("doc_id") === 1L)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("cnt")))
    val margins = snaps.map { case (w, b) => f1.map { case (bk, c) => w(bk.toInt) * c }.sum + b }
    val n = Epochs.toLong
    val sm = margins.sum
    val smm = margins.map(x => x * x).sum
    assert(m.getAs[Long]("confidence_milli") ==
      math.floor(1000.0 * (1L * sm) / n).toLong)
    assert(m.getAs[Long]("variability_milli") ==
      math.floor(1000.0 * (n * smm - sm * sm) / (n * n)).toLong)
  }

  test("trajectoryText == trajectory (r14 zero-shuffle path): all snapshots bit-equal") {
    val feats = Features.hashedBow(df, col("doc_id"), col("text"), Dim)
    val labels = df.select(col("doc_id"), col("y"))
    val a = Cartography.trajectory(feats, labels, Dim, Epochs)
    val b = Cartography.trajectoryText(df, col("doc_id"), col("text"), col("y"), Dim, Epochs)
    assert(a.size == b.size)
    a.zip(b).foreach { case ((wa, ba), (wb, bb)) =>
      assert(wa.toSeq == wb.toSeq && ba == bb)
    }
  }
}
