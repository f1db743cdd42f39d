package graft.ops

import graft.util.PlanCache.Shareable
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
  * Scale shape: train and test tokenize in disjoint passes (one
  * corpus of tokenize work total); the train explode collapses via
  * partial agg to |C|·|V| rows per task before its shuffle. The
  * class table (|C| rows with priors/defaults) is a bounded driver
  * fetch (the model-literal device — same contract as C7b
  * centroids), which lets the (class, token) weights PIVOT to one
  * |V|-row table with a weight column per class. Scoring is then a single token-keyed
  * join + one (doc)-keyed partial-agg producing |C| sum COLUMNS —
  * no |C|× row blowup, no (token, class) shuffle, and the argmax is
  * a codegen'd when-chain over class columns (strict > while
  * scanning classes ascending = ties to the lexicographically
  * smallest class), never a per-doc window. Docs with zero tokens
  * score prior-only via a left join from the test roster.
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

    // the model: (class, token) train counts — the explode feeds a
    // partial agg that collapses to |C|·|V| rows per task BEFORE the
    // shuffle, so the exchange is model-sized, never corpus-sized.
    // Train and test tokenize in disjoint passes (80/20 split): same
    // total tokenize work as one pass, but the train side never pays
    // a per-(doc, token) shuffle granularity it doesn't need.
    val trainCnt = tokens(base.filter(!col("is_test")))
      .groupBy(col("cls"), col("token")).agg(count(lit(1)).as("cnt"))
      .sharedPersist()

    // |V| as ONE bounded driver fetch off the cached model (the
    // model-literal device) — as a frame it rode into the class table
    // through a broadcast-exchange job; n_train is Σ n_docs of the
    // collected class rows, free driver arithmetic.
    val vScalar = trainCnt.agg(countDistinct(col("token")).as("v"))
      .head(1).headOption.map(_.getLong(0)).getOrElse(0L)

    // |C|-row class table: doc count -> prior, token total -> default.
    // Bounded DRIVER fetch (the model-literal device): |C| rows of
    // integers, which is what lets the weights pivot to class COLUMNS.
    val classRows = base.filter(!col("is_test"))
      .groupBy(col("cls")).agg(count(lit(1)).as("n_docs"))
      .join(trainCnt.groupBy(col("cls")).agg(sum(col("cnt")).as("tok_c")),
        Seq("cls"), "left")
      .withColumn("tok_c", coalesce(col("tok_c"), lit(0L)))
      .collect()
      .sortBy(_.getString(0))
    // empty train split: no classes, no model — degrade to an empty
    // confusion frame instead of seeding the argmax fold with
    // clsNames(0) (which would throw at plan-build time)
    if (classRows.isEmpty)
      return base.limit(0).select(
        col("cls").as("lang"), col("cls").as("pred_lang"),
        lit(0L).as("n_docs"))
    val clsNames = classRows.map(_.getString(0))
    // prior/default micro-nats computed driver-side over the collected
    // integers, via StrictMath: Spark's log EXPRESSION evaluates
    // through java.lang.StrictMath.log (fdlibm, platform-pinned),
    // while scala math.log is the intrinsified java.lang.Math.log —
    // allowed to differ by 1 ulp per platform. These literals replace
    // former column expressions, so StrictMath is the bit-identical
    // choice everywhere, not just on hosts where the intrinsic happens
    // to agree (the floor(·1e6) quantization would otherwise flip a
    // boundary case platform-dependently). The two
    // crossJoin(broadcast(...)) scalar rounds they rode in on are gone.
    val nTrainScalar = classRows.map(_.getLong(1)).sum
    val prior = classRows.map(r =>
      StrictMath.floor(StrictMath.log(r.getLong(1).toDouble / nTrainScalar) * 1e6).toLong)
    val default = classRows.map(r =>
      StrictMath.floor(StrictMath.log(1.0 / (r.getLong(2) + vScalar)) * 1e6).toLong)
    val tokC = classRows.map(r => r.getLong(2))

    // pivot the model to ONE |V|-row table with a weight column per
    // class — scoring then joins on token alone, no |C|x row blowup
    val wide = trainCnt
      .groupBy(col("token"))
      .pivot("cls", clsNames)
      .agg(first(col("cnt")))
    val wCols = clsNames.indices.map { i =>
      when(col(s"`${clsNames(i)}`").isNotNull,
        floor(log((col(s"`${clsNames(i)}`") + 1).cast("double") / (tokC(i) + vScalar)) * 1e6)
          .cast("bigint"))
        .otherwise(lit(default(i))).as(s"w_$i")
    }
    val wideW = wide.select(col("token") +: wCols: _*)

    // scoring: single token-keyed join, then one doc-keyed partial
    // agg with a sum COLUMN per class (per-occurrence weights sum
    // exactly as weight × count would — integer addition). The join
    // is LEFT from the test token stream: a test token absent from
    // the ENTIRE train vocabulary (OOV) still scores default_micro
    // per class — dropping it would diverge from the oracle (and
    // default_micro differs per class via tok_c, so the drop is not
    // argmax-neutral).
    val sums = clsNames.indices.map(i =>
      sum(coalesce(col(s"w_$i"), lit(default(i)))).as(s"s_$i"))
    val perDoc = tokens(base.filter(col("is_test")))
      .select(col("doc_id"), col("token"))
      .join(wideW, Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)

    // test roster left-joins the sums so zero-token docs score
    // prior-only; argmax = codegen'd when-chain, ascending classes
    // with strict > (ties to the lexicographically smallest class)
    val scores = clsNames.indices.map(i =>
      (lit(prior(i)) + coalesce(col(s"s_$i"), lit(0L))).as(s"score_$i"))
    val scored = base.filter(col("is_test"))
      .select(col("doc_id"), col("cls").as("true_cls"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id") +: col("true_cls") +: scores: _*)
    val best = clsNames.indices.tail.foldLeft(
      (lit(clsNames(0)), col("score_0"))) { case ((bc, bs), i) =>
        (when(col(s"score_$i") > bs, lit(clsNames(i))).otherwise(bc),
          when(col(s"score_$i") > bs, col(s"score_$i")).otherwise(bs))
    }._1
    scored
      .select(col("true_cls").as("lang"), best.as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
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
