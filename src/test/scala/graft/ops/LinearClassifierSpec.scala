package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LinearClassifierSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val Dim = 16

  // linearly separable by construction: positive docs speak "aye",
  // negatives speak "nay"; shared stopword "the" in both
  private def docs = Seq(
    (1L, "aye aye the captain", 1),
    (2L, "the aye votes aye aye", 1),
    (3L, "aye the", 1),
    (4L, "nay nay the motion", -1),
    (5L, "the nay nay nay", -1),
    (6L, "nay the nay", -1),
    (7L, "   ", -1)) // no tokens: excluded from fit and score
    .toDF("doc_id", "text", "y")

  private def feats = Features.hashedBow(docs, col("doc_id"), col("text"), Dim)
  private def labels = docs.select(col("doc_id"), col("y"))

  test("separable fixture: mistakes hit zero and predictions match labels") {
    val model = LinearClassifier.fitPerceptron(feats, labels, Dim, epochs = 6)
    assert(model.mistakes.last == 0L, s"training curve: ${model.mistakes}")
    val scored = LinearClassifier.score(feats, model)
      .join(labels, Seq("doc_id")).collect()
    assert(scored.length == 6) // doc 7 has no feature rows
    scored.foreach(r => assert(r.getAs[Int]("pred") == r.getAs[Int]("y"),
      s"doc ${r.getAs[Long]("doc_id")} predicted wrong"))
  }

  test("first-epoch update equals the hand-computed all-docs gradient") {
    // epoch 1 starts from w=0, b=0: every doc has margin 0, y*0 <= 0,
    // so ALL docs are misclassified and the update is Σ y·cnt per
    // bucket and Σ y for bias
    val model = LinearClassifier.fitPerceptron(feats, labels, Dim, epochs = 1)
    val expected = feats.join(labels, Seq("doc_id"))
      .groupBy(col("bucket")).agg(sum(col("y") * col("cnt")).as("g"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    (0 until Dim).foreach { b =>
      assert(model.weights(b) == expected.getOrElse(b, 0L), s"bucket $b")
    }
    assert(model.bias == 3L - 3L) // 3 positives, 3 labeled negatives with tokens
    assert(model.mistakes == Seq(6L))
  }

  test("fit is partitioning-independent (exact integer arithmetic)") {
    val m1 = LinearClassifier.fitPerceptron(feats.repartition(1), labels, Dim, 3)
    val m13 = LinearClassifier.fitPerceptron(feats.repartition(13), labels.repartition(5), Dim, 3)
    assert(m1.weights.toSeq == m13.weights.toSeq)
    assert(m1.bias == m13.bias && m1.mistakes == m13.mistakes)
  }

  test("evaluate: hand-checked confusion counts and floor-milli metrics") {
    val scored = Seq((1, 1), (1, 1), (1, -1), (-1, 1), (-1, -1), (-1, -1), (-1, -1))
      .toDF("pred", "y") // tp=2 fp=1 fn=1 tn=3
    val r = LinearClassifier.evaluate(scored).collect()(0)
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"), r.getAs[Long]("tn"))
      == ((2L, 1L, 1L, 3L)))
    assert(r.getAs[Long]("accuracy_milli") == 714L) // floor(5000/7)
    assert(r.getAs[Long]("precision_milli") == 666L)
    assert(r.getAs[Long]("recall_milli") == 666L)
    assert(r.getAs[Long]("f1_milli") == 666L)
  }

  test("evaluate: zero denominators report -1, never NaN") {
    // no positive predictions and no positive labels: precision,
    // recall, f1 all undefined
    val allNeg = Seq((-1, -1), (-1, -1)).toDF("pred", "y")
    val r = LinearClassifier.evaluate(allNeg).collect()(0)
    assert(r.getAs[Long]("precision_milli") == -1L)
    assert(r.getAs[Long]("recall_milli") == -1L)
    assert(r.getAs[Long]("f1_milli") == -1L)
    assert(r.getAs[Long]("accuracy_milli") == 1000L)
    // defined precision/recall both zero: f1 undefined (0/0)
    val allWrong = Seq((1, -1), (-1, 1)).toDF("pred", "y")
    val r2 = LinearClassifier.evaluate(allWrong).collect()(0)
    assert(r2.getAs[Long]("precision_milli") == 0L)
    assert(r2.getAs[Long]("recall_milli") == 0L)
    assert(r2.getAs[Long]("f1_milli") == -1L)
  }

  test("selectUncertain: least-|margin| k per group, heap == window composition") {
    val scored = Seq(
      (1L, 10L, "a"), (2L, -3L, "a"), (3L, 0L, "a"), (4L, -12L, "a"),
      (5L, 5L, "b"), (6L, -5L, "b"), (7L, 2L, "b"))
      .toDF("doc_id", "margin", "grp0")
    val got = LinearClassifier.selectUncertain(scored, col("grp0"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // group a: |0| then |-3|; group b: |2| then |5| (tie |5|,|−5| →
    // smaller doc_id 5 first)
    assert(got == Seq(("a", 1L, 3L, 0L), ("a", 2L, 2L, 3L),
      ("b", 1L, 7L, 2L), ("b", 2L, 5L, 5L)))
  }

  test("one-vs-all: separable 3-class fixture predicts every class; ties break alphabetically") {
    val tri = Seq(
      (1L, "rouge rouge vin", "fr"), (2L, "vin rouge", "fr"),
      (3L, "rot rot wein", "de"), (4L, "wein rot", "de"),
      (5L, "red red wine", "en"), (6L, "wine red", "en"))
      .toDF("doc_id", "text", "cls")
    val feats = Features.hashedBow(tri, col("doc_id"), col("text"), Dim)
    val labels = tri.select(col("doc_id"), col("cls"))
    val models = LinearClassifier.fitOneVsAll(feats, labels, Seq("de", "en", "fr"), Dim, 6)
    val preds = LinearClassifier.predictOneVsAll(feats, models)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = tri.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(preds == want)
    // all-zero models (0 epochs of data → fit on empty features):
    // every margin equal → alphabetically first class wins
    val zeroModels = Seq("de", "en", "fr").map(_ -> LinearClassifier.PerceptronModel(
      Array.fill(Dim)(0L), 0L, Seq.empty))
    val tied = LinearClassifier.predictOneVsAll(feats, zeroModels)
      .collect().map(_.getString(1)).toSet
    assert(tied == Set("de"))
  }

  test("fused one-vs-all is bit-identical to L separate binary fits") {
    val tri = Seq(
      (1L, "rouge rouge vin", "fr"), (2L, "vin rouge", "fr"),
      (3L, "rot rot wein", "de"), (4L, "wein rot aye", "de"),
      (5L, "red red wine", "en"), (6L, "wine red vin", "en"))
      .toDF("doc_id", "text", "cls")
    val feats = Features.hashedBow(tri, col("doc_id"), col("text"), Dim)
    val labels = tri.select(col("doc_id"), col("cls"))
    val fused = LinearClassifier.fitOneVsAll(feats, labels, Seq("de", "en", "fr"), Dim, 4)
    fused.foreach { case (c, m) =>
      val solo = LinearClassifier.fitPerceptron(
        feats,
        labels.select(col("doc_id"), when(col("cls") === c, 1).otherwise(-1).as("y")),
        Dim, 4)
      assert(m.weights.toSeq == solo.weights.toSeq, s"weights for $c")
      assert(m.bias == solo.bias && m.mistakes == solo.mistakes, s"bias/curve for $c")
    }
  }

  test("score margins are the exact dot products under the returned model") {
    val model = LinearClassifier.fitPerceptron(feats, labels, Dim, 2)
    val margins = LinearClassifier.score(feats, model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sparse = feats.collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
    val byDoc = sparse.groupBy(_._1).map { case (d, rows) =>
      d -> (rows.map { case (_, b, c) => model.weights(b) * c }.sum + model.bias)
    }
    assert(margins == byDoc)
  }

  // ---- r14: the zero-shuffle entry-frame paths must be bit-identical
  // to the exploded originals (same integer sums, same epoch schedule)

  test("fitPerceptronText == fitPerceptron: weights, bias, training curve") {
    for (epochs <- Seq(1, 3, 6)) {
      val a = LinearClassifier.fitPerceptron(feats, labels, Dim, epochs)
      val b = LinearClassifier.fitPerceptronText(
        docs, col("doc_id"), col("text"), col("y"), Dim, epochs)
      assert(a.weights.toSeq == b.weights.toSeq, s"weights @ $epochs epochs")
      assert(a.bias == b.bias, s"bias @ $epochs epochs")
      assert(a.mistakes == b.mistakes, s"curve @ $epochs epochs")
    }
  }

  test("fitOneVsAllEntries == fitOneVsAll on the 3-class fixture") {
    val tri = Seq(
      (1L, "rouge rouge vin", "fr"), (2L, "vin rouge", "fr"),
      (3L, "rot rot wein", "de"), (4L, "wein rot aye", "de"),
      (5L, "red red wine", "en"), (6L, "wine red vin", "en"),
      (7L, "  ", "en")) // token-less: excluded on both paths
      .toDF("doc_id", "text", "cls")
    val classes = Seq("de", "en", "fr")
    val exploded = LinearClassifier.fitOneVsAll(
      Features.hashedBow(tri, col("doc_id"), col("text"), Dim),
      tri.select(col("doc_id"), col("cls")), classes, Dim, 4)
    val entries = LinearClassifier.entryFrameWith(
      tri, col("doc_id"), col("text"), Dim, "cls" -> col("cls"))
    val inRow = LinearClassifier.fitOneVsAllEntries(entries, classes, Dim, 4)
    exploded.zip(inRow).foreach { case ((c1, m1), (c2, m2)) =>
      assert(c1 == c2)
      assert(m1.weights.toSeq == m2.weights.toSeq, s"weights for $c1")
      assert(m1.bias == m2.bias && m1.mistakes == m2.mistakes, s"bias/curve for $c1")
    }
    // and the text-path argmax serves the same predictions
    val a = LinearClassifier.predictOneVsAll(
      Features.hashedBow(tri, col("doc_id"), col("text"), Dim), exploded)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = LinearClassifier.predictOneVsAllText(
      tri, col("doc_id"), col("text"), Dim, inRow)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("fitArmsEntries == per-arm sequential fits (row-subset fusion)") {
    val entries = LinearClassifier.entryFrame(
      docs, col("doc_id"), col("text"), col("y"), Dim,
      extra = Seq("parity" -> (col("doc_id") % 2)))
    val arms = Seq(
      "all" -> lit(true),
      "even" -> (col("parity") === 0),
      "odd" -> (col("parity") === 1))
    val fused = LinearClassifier.fitArmsEntries(entries, arms, Dim, 4).toMap
    arms.foreach { case (n, flag) =>
      val solo = LinearClassifier.fitPerceptronEntries(entries.filter(flag), Dim, 4)
      assert(fused(n).weights.toSeq == solo.weights.toSeq, s"weights for arm $n")
      assert(fused(n).bias == solo.bias && fused(n).mistakes == solo.mistakes,
        s"bias/curve for arm $n")
    }
  }

  test("scoreText row set matches score∘hashedBow after the has_tokens gate") {
    val model = LinearClassifier.fitPerceptronText(
      docs, col("doc_id"), col("text"), col("y"), Dim, 2)
    val a = LinearClassifier.score(feats, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    val b = LinearClassifier.scoreText(docs, col("doc_id"), col("text"), Dim, model)
      .filter(col("has_tokens"))
      .select(col("doc_id"), col("margin"), col("pred"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
