package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes — the generative text classifier that
  * trains in ONE aggregation pass: where the C99 perceptron pays the
  * per-epoch job floor epochs times, NB's "training" is a single
  * (class, token) groupBy, and scoring is a token-keyed join + a
  * partial-agg sum. At 100 TB that contrast is the whole point —
  * this is the classifier you can afford to refit on every corpus
  * snapshot, and the standard first-pass language/quality gate.
  *
  * Determinism: every model parameter is an integer. Laplace(+1)
  * log-likelihoods floor to micro-nats ONCE at fit time —
  * floor(ln((cnt+1)/(tok_c+V))·1e6) — so scoring is pure int64
  * summation (addition-order independent); priors floor the same
  * way; unseen tokens take the per-class default floor(ln(1/(tok_c
  * +V))·1e6). The ln inputs are ratios of int64s — bit-identical
  * IEEE doubles on both engines (the C42/C119 micro-nat device).
  * Argmax ties break toward the lexicographically smallest class.
  *
  * Scale shape: no driver state at all — the class table (|C| rows,
  * with priors/defaults) broadcasts into the scoring join; V and
  * the train-doc total ride as one-row broadcast scalars; the only
  * shuffles are the (class, token) count and the (doc, class) score
  * partial-aggs. Docs with zero tokens score prior-only via the
  * doc×class grid, not dropped.
  */
object NaiveBayes {

  /** Hash-split train/test (test = hash60 % mod == 0, the C19
    * device), fit on train, score test, return the confusion matrix.
    *
    * @return (lang, pred_lang, n_docs) — true class, NB argmax,
    *         count; ordered by (lang, pred_lang)
    */
  def confusion(
      docs: DataFrame,
      id: Column,
      text: Column,
      label: Column,
      testMod: Long = 5L): DataFrame = {
    val base = docs.select(
      id.cast("bigint").as("doc_id"),
      label.cast("string").as("cls"),
      text.as("text"),
      (Dedup.md5Hash60(concat(lit("nbsplit:"), id.cast("string"))) % testMod === 0)
        .as("is_test"))

    def tokens(d: DataFrame): DataFrame = d
      .select(col("doc_id"), col("cls"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")

    val train = base.filter(!col("is_test"))
    val test = base.filter(col("is_test"))
    val trainTok = tokens(train)

    // one-row scalars: vocabulary size and train-doc total
    val vocabV = trainTok.agg(countDistinct(col("token")).as("v"))
    val nTrain = train.agg(count(lit(1)).as("n_train"))

    // |C|-row class table: doc count -> prior, token total -> default
    val classes = train.groupBy(col("cls")).agg(count(lit(1)).as("n_docs"))
      .join(trainTok.groupBy(col("cls")).agg(count(lit(1)).as("tok_c")),
        Seq("cls"), "left")
      .withColumn("tok_c", coalesce(col("tok_c"), lit(0L)))
      .crossJoin(broadcast(vocabV)).crossJoin(broadcast(nTrain))
      .select(col("cls"),
        floor(log(col("n_docs").cast("double") / col("n_train")) * 1e6)
          .cast("bigint").as("prior_micro"),
        floor(log(lit(1.0) / (col("tok_c") + col("v"))) * 1e6)
          .cast("bigint").as("default_micro"),
        col("tok_c"), col("v"))

    // the model: floored micro-nat weight per observed (class, token)
    val weights = trainTok.groupBy(col("cls"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(classes.select(col("cls"), col("tok_c"), col("v"))), "cls")
      .select(col("cls"), col("token"),
        floor(log((col("cnt") + 1).cast("double") / (col("tok_c") + col("v"))) * 1e6)
          .cast("bigint").as("w_micro"))

    // scoring: per-(doc, class) token-weight sum; unseen -> default
    val testTok = tokens(test).select(col("doc_id"), col("token"))
    val wts = weights.select(col("cls").as("wcls"), col("token").as("wtoken"), col("w_micro"))
    val tokScores = testTok
      .crossJoin(broadcast(classes.select(col("cls").as("scls"), col("default_micro"))))
      .join(wts, col("token") === col("wtoken") && col("scls") === col("wcls"), "left")
      .select(col("doc_id"), col("scls").as("cls"),
        coalesce(col("w_micro"), col("default_micro")).as("w"))
      .groupBy(col("doc_id"), col("cls")).agg(sum(col("w")).as("tok_sum"))

    // doc x class grid keeps zero-token docs (prior-only score)
    val grid = test.select(col("doc_id"), col("cls").as("true_cls"))
      .crossJoin(broadcast(classes.select(col("cls"), col("prior_micro"))))
      .join(tokScores, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("true_cls"), col("cls"),
        (col("prior_micro") + coalesce(col("tok_sum"), lit(0L))).as("score"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("cls"))
    grid.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy(col("true_cls").as("lang"), col("cls").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** DuckDB twin of [[confusion]] over `documents`. */
  def confusionSql(testMod: Long = 5L): String = {
    val h = "('0x' || substr(md5('nbsplit:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    s"""WITH base AS (SELECT doc_id, lang AS cls, text,
       |    ($h) % $testMod = 0 AS is_test FROM documents),
       |trainb AS (SELECT * FROM base WHERE NOT is_test),
       |testb AS (SELECT * FROM base WHERE is_test),
       |ttok AS (SELECT doc_id, cls, u.t AS token
       |  FROM trainb, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(t)
       |  WHERE u.t <> ''),
       |vocab AS (SELECT count(DISTINCT token) AS v FROM ttok),
       |ntrain AS (SELECT count(*) AS n_train FROM trainb),
       |cls AS (SELECT d.cls, d.n_docs, coalesce(t.tok_c, 0) AS tok_c, v, n_train,
       |    CAST(floor(ln(CAST(d.n_docs AS DOUBLE) / n_train) * 1e6) AS BIGINT) AS prior_micro,
       |    CAST(floor(ln(1.0 / (coalesce(t.tok_c, 0) + v)) * 1e6) AS BIGINT) AS default_micro
       |  FROM (SELECT cls, count(*) AS n_docs FROM trainb GROUP BY cls) d
       |  LEFT JOIN (SELECT cls, count(*) AS tok_c FROM ttok GROUP BY cls) t USING (cls),
       |  vocab, ntrain),
       |wts AS (SELECT w.cls, w.token,
       |    CAST(floor(ln(CAST(w.cnt + 1 AS DOUBLE) / (c.tok_c + c.v)) * 1e6) AS BIGINT) AS w_micro
       |  FROM (SELECT cls, token, count(*) AS cnt FROM ttok GROUP BY cls, token) w
       |  JOIN cls c USING (cls)),
       |stok AS (SELECT doc_id, u.t AS token
       |  FROM testb, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(t)
       |  WHERE u.t <> ''),
       |tsc AS (SELECT s.doc_id, c.cls,
       |    CAST(sum(coalesce(w.w_micro, c.default_micro)) AS BIGINT) AS tok_sum
       |  FROM stok s CROSS JOIN cls c
       |  LEFT JOIN wts w ON w.token = s.token AND w.cls = c.cls
       |  GROUP BY s.doc_id, c.cls),
       |grid AS (SELECT t.doc_id, t.cls AS true_cls, c.cls,
       |    c.prior_micro + coalesce(ts.tok_sum, 0) AS score
       |  FROM testb t CROSS JOIN cls c
       |  LEFT JOIN tsc ts ON ts.doc_id = t.doc_id AND ts.cls = c.cls),
       |pred AS (SELECT doc_id, true_cls, cls FROM (
       |    SELECT doc_id, true_cls, cls,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rk
       |    FROM grid) WHERE rk = 1)
       |SELECT true_cls AS lang, cls AS pred_lang, count(*) AS n_docs
       |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
