package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C142 Moore-Lewis cross-entropy difference: directional selection,
  * OOV safety, degenerate docs, and the seed==corpus fixed point.
  */
class MooreLewisSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // seed docs speak "alpha beta gamma"; off-domain docs speak
  // "delta epsilon zeta"; one candidate of each flavor
  private def corpus = Seq(
    (1L, "alpha beta gamma alpha beta gamma alpha beta", true),
    (2L, "beta gamma alpha beta gamma alpha beta gamma", true),
    (3L, "delta epsilon zeta delta epsilon zeta delta", false),
    (4L, "zeta epsilon delta zeta epsilon delta zeta", false),
    (5L, "alpha beta gamma alpha beta", false), // seed-flavored candidate
    (6L, "delta epsilon zeta delta epsilon", false) // off-domain candidate
  ).toDF("doc_id", "text", "indom")

  private def scored =
    MooreLewis.score(corpus, col("doc_id"), col("text"), col("indom"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("seed-flavored candidate keeps, off-domain candidate drops") {
    val m = scored
    assert(m(5L).getAs[Boolean]("keep"))
    assert(!m(6L).getAs[Boolean]("keep"))
    assert(m(5L).getAs[Double]("ml_score") > m(6L).getAs[Double]("ml_score"))
  }

  test("scores are finite for fully-OOV-vs-seed docs (add-one backoff)") {
    val m = scored
    for (id <- Seq(3L, 4L, 6L)) {
      val s = m(id).getAs[Double]("ml_score")
      assert(!s.isNaN && !s.isInfinite)
    }
  }

  test("docs with fewer than two tokens score 0.0 and never keep") {
    val df = Seq((1L, "one two one two", true), (2L, "solo", false), (3L, "", false))
      .toDF("doc_id", "text", "indom")
    val m = MooreLewis.score(df, col("doc_id"), col("text"), col("indom"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(2L, 3L)) {
      assert(m(id).getAs[Long]("n_bigrams") == 0L)
      assert(m(id).getAs[Double]("ml_score") == 0.0)
      assert(!m(id).getAs[Boolean]("keep"))
    }
  }

  test("seed == corpus is a fixed point: every score exactly 0, nothing keeps") {
    val all = corpus.withColumn("indom", lit(true))
    val rows = MooreLewis.score(all, col("doc_id"), col("text"), col("indom")).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Double]("ml_score") == 0.0)
      assert(!r.getAs[Boolean]("keep"))
    }
  }
}
