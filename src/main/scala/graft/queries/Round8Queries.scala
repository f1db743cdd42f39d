package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Features, LinearClassifier, RankEval}

/** Round-8 additions: distributed linear-classifier training (batch
  * perceptron on hashed bag-of-words, exact integer weights) and its
  * serving-path scorer.
  */
object Round8Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Feature dim + epochs for the classifier queries — small dim
    * keeps the unrolled oracle readable; exactness is dim-blind.
    */
  val ClsDim = 64
  val ClsEpochs = 3
  val ActiveK = 5

  /** One-vs-all language classes (sorted; fixed on both sides) and
    * its epoch count — 2 keeps the 5-class unrolled oracle at 10
    * epoch blocks.
    */
  val OvaClasses = Seq("de", "en", "es", "fr", "zh")
  val OvaEpochs = 2

  /** The training task: an English-vs-rest language gate — labels
    * derivable identically on both engines from the lang column.
    */
  private def labels(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("bigint").as("doc_id"),
      when(col("lang") === "en", 1).otherwise(-1).as("y"))

  private def fit(s: SparkSession, dir: String): LinearClassifier.PerceptronModel = {
    val docs = t(s, dir, "documents")
    LinearClassifier.fitPerceptron(
      Features.hashedBow(docs, col("doc_id"), col("text"), ClsDim),
      labels(docs), ClsDim, ClsEpochs)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C99: batch-perceptron fit — final nonzero integer weights.
    "q_perceptron_train" -> { (s, dir) =>
      val model = fit(s, dir)
      import s.implicits._
      model.weightRows.toDF("bucket", "weight")
        .select(col("bucket").cast("bigint").as("bucket"), col("weight"))
        .orderBy(col("bucket"))
    },

    // C99 serving path: integer margins + sign predictions of the
    // fitted model over the corpus, with gold labels for inspection.
    "q_perceptron_score" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val model = fit(s, dir)
      LinearClassifier.score(
        Features.hashedBow(docs, col("doc_id"), col("text"), ClsDim), model)
        .join(labels(docs), Seq("doc_id"))
        .select(col("doc_id"), col("margin"), col("pred"), col("y"))
        .orderBy(col("doc_id"))
    },

    // C103: one-vs-all multiclass — a TRAINED language classifier
    // (5 binary integer-perceptron fits, argmax serving in one
    // doc-keyed aggregation pass with deterministic ties).
    "q_ova_lang" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val feats = Features.hashedBow(docs, col("doc_id"), col("text"), ClsDim)
        .persist()
      try {
        val classLabels = docs.select(col("doc_id").cast("bigint").as("doc_id"),
          col("lang").as("cls"))
        val models = LinearClassifier.fitOneVsAll(
          feats, classLabels, OvaClasses, ClsDim, OvaEpochs)
        LinearClassifier.predictOneVsAll(feats, models)
          .join(classLabels, Seq("doc_id"))
          .select(col("doc_id"), col("pred_cls"), col("margin"),
            col("cls").as("actual"), (col("pred_cls") === col("cls")).as("correct"))
          .orderBy(col("doc_id"))
      } finally feats.unpersist()
    },

    // C102: exact distributed AUC (Mann-Whitney, midrank ties) of
    // the fitted gate — global, over the distinct-margin histogram.
    "q_auc_global" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val model = fit(s, dir)
      val scored = LinearClassifier.score(
        Features.hashedBow(docs, col("doc_id"), col("text"), ClsDim), model)
        .join(labels(docs), Seq("doc_id"))
      RankEval.aucMilli(scored, col("margin"), col("y"))
    },

    // C102 grouped: per-source ranking quality (group-partitioned
    // windows — nothing single-partition).
    "q_auc_by_source" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val model = fit(s, dir)
      val scored = LinearClassifier.score(
        Features.hashedBow(docs, col("doc_id"), col("text"), ClsDim), model)
        .join(labels(docs), Seq("doc_id"))
        .join(docs.select(col("doc_id").cast("bigint").as("doc_id"), col("source")), Seq("doc_id"))
      RankEval.aucMilliByGroup(scored, col("source"), col("margin"), col("y"))
        .withColumnRenamed("grp", "source")
        .orderBy(col("source"))
    },

    // C101: margin-based active learning — the k least-confident
    // docs per source under the fitted gate (C66 bounded heap on
    // -|margin|: ≤ k ids per (task, group) through the shuffle).
    "q_active_select" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val model = fit(s, dir)
      val scored = LinearClassifier.score(
        Features.hashedBow(docs, col("doc_id"), col("text"), ClsDim), model)
        .join(docs.select(col("doc_id").cast("bigint").as("doc_id"), col("source")), Seq("doc_id"))
      LinearClassifier.selectUncertain(scored, col("source"), ActiveK)
        .withColumnRenamed("grp", "source")
        .orderBy(col("source"), col("rank"))
    },

    // C100: classifier evaluation — exact confusion counts + integer
    // floor-milli accuracy/precision/recall/F1 of the fitted gate.
    "q_classifier_eval" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val model = fit(s, dir)
      LinearClassifier.evaluate(
        LinearClassifier.score(
          Features.hashedBow(docs, col("doc_id"), col("text"), ClsDim), model)
          .join(labels(docs), Seq("doc_id")))
    }
  )

  /** Shared WITH prelude: tokenization/bucketing identical to
    * q_hashed_bow's oracle, labels from lang.
    */
  /** feats + labels WITH-chain head, no fit — composable base for
    * oracles that run their own (or several) fit chains.
    */
  private[queries] def preludeBase: String =
    s"""WITH tok AS (SELECT doc_id,
       |               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |             FROM documents),
       |feats AS (SELECT doc_id, bucket, count(*) AS cnt
       |          FROM (SELECT doc_id, ${Features.bucketSql("tok", ClsDim)} AS bucket
       |                FROM tok WHERE tok <> '') GROUP BY doc_id, bucket),
       |lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
       |        FROM documents)""".stripMargin

  private[queries] def prelude: String =
    s"""$preludeBase,
       |${LinearClassifier.fitSqlCtes(ClsEpochs)}""".stripMargin

  /** Margins under the FINAL weights (w<epochs>), joined with labels
    * — the oracle-side twin of score(...) ∘ hashedBow.
    */
  private[queries] def finalScoredCte: String =
    s"""fsc AS (SELECT f.doc_id,
       |  CAST(COALESCE(SUM(w.w * f.cnt), 0) + (SELECT b FROM bias$ClsEpochs) AS BIGINT) AS margin,
       |  l.y
       |FROM feats f JOIN lab l USING (doc_id)
       |LEFT JOIN w$ClsEpochs w USING (bucket)
       |GROUP BY f.doc_id, l.y)""".stripMargin

  val oracles: Map[String, String] = Map(

    "q_perceptron_train" ->
      s"""$prelude
         |SELECT bucket, w AS weight FROM w$ClsEpochs
         |WHERE w <> 0 ORDER BY bucket""".stripMargin,

    "q_perceptron_score" ->
      s"""$prelude
         |SELECT f.doc_id,
         |  CAST(COALESCE(SUM(w.w * f.cnt), 0) + (SELECT b FROM bias$ClsEpochs) AS BIGINT) AS margin,
         |  CASE WHEN COALESCE(SUM(w.w * f.cnt), 0) + (SELECT b FROM bias$ClsEpochs) > 0
         |       THEN 1 ELSE -1 END AS pred,
         |  l.y
         |FROM feats f JOIN lab l USING (doc_id)
         |LEFT JOIN w$ClsEpochs w USING (bucket)
         |GROUP BY f.doc_id, l.y
         |ORDER BY f.doc_id""".stripMargin,

    "q_ova_lang" -> {
      val classCtes = OvaClasses.map { c =>
        s"""lab_$c AS (SELECT doc_id, CASE WHEN cls = '$c' THEN 1 ELSE -1 END AS y FROM clsmap),
           |${LinearClassifier.fitSqlCtes(OvaEpochs, s"${c}_", s"lab_$c")},
           |sc_$c AS (SELECT f.doc_id,
           |  CAST(COALESCE(SUM(w.w * f.cnt), 0) + (SELECT b FROM ${c}_bias$OvaEpochs) AS BIGINT) AS margin
           |  FROM feats f LEFT JOIN ${c}_w$OvaEpochs w USING (bucket)
           |  GROUP BY f.doc_id)""".stripMargin
      }.mkString(",\n")
      val unionAll = OvaClasses
        .map(c => s"SELECT doc_id, '$c' AS cls, margin FROM sc_$c")
        .mkString("\nUNION ALL\n")
      s"""$prelude,
         |clsmap AS (SELECT doc_id, lang AS cls FROM documents),
         |$classCtes,
         |all_m AS ($unionAll),
         |ranked AS (SELECT doc_id, cls, margin,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY margin DESC, cls) AS rn
         |  FROM all_m)
         |SELECT r.doc_id, r.cls AS pred_cls, r.margin, c.cls AS actual,
         |  (r.cls = c.cls) AS correct
         |FROM ranked r JOIN clsmap c USING (doc_id)
         |WHERE rn = 1 ORDER BY r.doc_id""".stripMargin
    },

    "q_auc_global" ->
      s"""$prelude,
         |$finalScoredCte
         |${RankEval.aucSql("fsc")}""".stripMargin,

    "q_auc_by_source" ->
      s"""$prelude,
         |$finalScoredCte,
         |msrc AS (SELECT m.margin, m.y, d.source
         |         FROM fsc m JOIN documents d USING (doc_id))
         |${RankEval.aucSql("msrc", Seq("source"))}""".stripMargin,

    "q_active_select" ->
      s"""$prelude,
         |sc AS (SELECT f.doc_id, d.source,
         |  abs(CAST(COALESCE(SUM(w.w * f.cnt), 0) + (SELECT b FROM bias$ClsEpochs) AS BIGINT)) AS am
         |FROM feats f JOIN documents d USING (doc_id)
         |LEFT JOIN w$ClsEpochs w USING (bucket)
         |GROUP BY f.doc_id, d.source)
         |SELECT source, rank, doc_id, am AS abs_margin FROM (
         |  SELECT source, doc_id, am,
         |    row_number() OVER (PARTITION BY source ORDER BY am, doc_id) AS rank
         |  FROM sc) t
         |WHERE rank <= $ActiveK ORDER BY source, rank""".stripMargin,

    "q_classifier_eval" -> {
      val scoredCte =
        s"""scored AS (SELECT f.doc_id,
           |  CASE WHEN COALESCE(SUM(w.w * f.cnt), 0) + (SELECT b FROM bias$ClsEpochs) > 0
           |       THEN 1 ELSE -1 END AS pred,
           |  l.y
           |FROM feats f JOIN lab l USING (doc_id)
           |LEFT JOIN w$ClsEpochs w USING (bucket)
           |GROUP BY f.doc_id, l.y)""".stripMargin
      s"""$prelude,
         |$scoredCte
         |${LinearClassifier.evaluateSql("scored")}""".stripMargin
    }
  )
}
