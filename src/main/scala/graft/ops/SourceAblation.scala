package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.LinearClassifier.PerceptronModel
import graft.util.PlanCache.Shareable

/** Leave-one-source-out data valuation (C124) — the ablation answer
  * to "is this corpus source helping or hurting the gate": for each
  * candidate source, re-fit the C99 perceptron on the training split
  * WITHOUT that source and measure the exact AUC delta on a fixed
  * hash-held-out evaluation split. A positive delta (base minus
  * ablated AUC) means the source carries signal the rest of the
  * corpus does not; a negative delta is the actionable one — the
  * source is actively miscalibrating the gate and is a candidate for
  * down-weighting (C92) or removal. This is the train-and-measure
  * half of data valuation; C53 (DSIR) reweights by distribution
  * match WITHOUT retraining, and C92 (DoReMi) reweights by
  * per-domain excess loss — ablation is the ground truth both
  * approximate.
  *
  * Determinism, engine parity: the eval split is the C19 md5 hash
  * split ("ablsplit:" + id), each fit is the C99 integer perceptron
  * (bit-exact, order-insensitive), and the metric is C102's exact
  * integer AUC — so the DuckDB twin (one unrolled fit chain per
  * ablation over the same feats CTE, the C116 device) reproduces
  * every delta bit for bit.
  *
  * Scale shape: ONE hashed-BoW featurization serves every fit and
  * every scoring pass (features restrict per-ablation through the
  * LABEL join, never a re-tokenize); K+1 fits each follow C99's
  * bounded-driver pattern (dim longs per epoch on the driver, the
  * corpus never collected); at 100 TB the eval split is a fixed-rate
  * hash sample and K is the handful of sources under review, so the
  * whole audit is K+1 fit jobs + K+1 single-pass scorings. The
  * per-model AUC is a 1-row driver fetch (the C75 driver-decision
  * pattern) assembled into a K-row result.
  */
object SourceAblation {

  /** AUC deltas from ablating each of `ablate` sources.
    *
    * @param docs    corpus with id/text/source columns
    * @param labels  (doc_id, y) with y in {+1, -1}
    * @param evalMod eval split = md5("ablsplit:" + id) % evalMod == 0
    * @param fitMemo optional memoizer keyed by ablated-source name
    *                ("__all__" for the baseline fit)
    * @return (source, n_removed, auc_milli, base_auc_milli,
    *         delta_milli) ordered by source; delta = base - ablated
    */
  def aucDeltas(
      docs: DataFrame, id: Column, text: Column, source: Column,
      labels: DataFrame, dim: Int, epochs: Int, ablate: Seq[String],
      evalMod: Long = 4L,
      fitMemo: (String, () => PerceptronModel) => PerceptronModel =
        (_, mk) => mk()): DataFrame = {
    require(ablate.nonEmpty, "ablate at least one source")
    val spark = docs.sparkSession
    import spark.implicits._

    val base = docs.select(
      id.cast("bigint").as("doc_id"), text.as("text"),
      source.cast("string").as("source"),
      (Dedup.md5Hash60(concat(lit("ablsplit:"), id.cast("string"))) % evalMod === 0)
        .as("is_eval"))
    // ONE featurization for everything, shared-persisted: each fit
    // persists its own (feats ⋈ train-labels) projection internally,
    // but they all derive from THIS cached tokenize+hash pass — the
    // per-ablation restriction happens through the label join inside
    // the fit (the C116 device), never a re-tokenize
    val feats = Features.hashedBow(base, col("doc_id"), col("text"), dim)
      .sharedPersist()
    val trainRoster = base.filter(!col("is_eval"))
      .select(col("doc_id"), col("source"))

    def fitExcluding(excl: Option[String]): PerceptronModel = {
      val roster = excl match {
        // null-safe: a NULL source must stay in every ablated fit,
        // matching the twin's NOT IN (... WHERE source = 's0') —
        // plain =!= would evaluate NULL to NULL and drop those rows
        case Some(s0) => trainRoster.filter(!(col("source") <=> lit(s0)))
        case None => trainRoster
      }
      val trainLabels = labels.join(roster.select("doc_id"), Seq("doc_id"), "left_semi")
      fitMemo(excl.getOrElse("__all__"),
        () => LinearClassifier.fitPerceptron(feats, trainLabels, dim, epochs))
    }

    val evalFeats = feats.join(
      base.filter(col("is_eval")).select("doc_id"), Seq("doc_id"), "left_semi")
    def aucOf(m: PerceptronModel): Long = {
      val r = RankEval.aucMilli(
          LinearClassifier.score(evalFeats, m).join(labels, Seq("doc_id")),
          col("margin"), col("y"))
        .collect()(0) // 1-row driver fetch
      // a degenerate eval split (empty, or single-class -> the -1
      // sentinel) would make every delta 0 and the audit read as
      // "no source matters" — fail loudly instead
      require(!r.isNullAt(r.fieldIndex("auc_milli"))
          && r.getAs[Long]("auc_milli") >= 0L,
        s"degenerate eval split: p=${r.get(r.fieldIndex("p"))}, " +
          s"n=${r.get(r.fieldIndex("n"))} — need both classes held out")
      r.getAs[Long]("auc_milli")
    }

    val baseAuc = aucOf(fitExcluding(None))
    val removedCounts = trainRoster.groupBy(col("source"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ablate.sorted.map { s0 =>
      val auc = aucOf(fitExcluding(Some(s0)))
      (s0, removedCounts.getOrElse(s0, 0L), auc, baseAuc, baseAuc - auc)
    }.toDF("source", "n_removed", "auc_milli", "base_auc_milli", "delta_milli")
  }

  /** DuckDB twin: per-ablation lab CTEs + one unrolled fit chain per
    * model over the SHARED `feats` CTE (caller supplies it — the
    * ClassifierQueries prelude), eval scoring + exact AUC per model,
    * assembled into the same (source, ...) rows. `hash60` is the
    * caller's md5-60 SQL for a given expression.
    */
  def aucDeltasSqlTail(epochs: Int, ablate: Seq[String], evalMod: Long,
      hash60: String => String): String = {
    val h = hash60("'ablsplit:' || CAST(doc_id AS VARCHAR)")
    val sorted = ablate.sorted
    val sb = new StringBuilder
    sb.append(s"ev AS (SELECT doc_id FROM documents WHERE ($h) % $evalMod = 0),\n")
    sb.append("lab_ev AS (SELECT doc_id, y FROM lab WHERE doc_id IN (SELECT doc_id FROM ev)),\n")
    sb.append("lab_b AS (SELECT l.doc_id, l.y FROM lab l WHERE l.doc_id NOT IN (SELECT doc_id FROM ev)),\n")
    sorted.zipWithIndex.foreach { case (s0, i) =>
      sb.append(s"lab_a$i AS (SELECT l.doc_id, l.y FROM lab_b l WHERE l.doc_id NOT IN " +
        s"(SELECT doc_id FROM documents WHERE source = '$s0')),\n")
    }
    sb.append(LinearClassifier.fitSqlCtes(epochs, "b_", "lab_b")).append(",\n")
    sorted.indices.foreach { i =>
      sb.append(LinearClassifier.fitSqlCtes(epochs, s"a${i}_", s"lab_a$i")).append(",\n")
    }
    def scoredCte(name: String, prefix: String) =
      s"""sc_$name AS (SELECT f.doc_id,
         |  CAST(COALESCE(SUM(w.w * f.cnt), 0) + (SELECT b FROM ${prefix}bias$epochs) AS BIGINT) AS margin,
         |  l.y
         |FROM feats f JOIN lab_ev l USING (doc_id)
         |LEFT JOIN ${prefix}w$epochs w USING (bucket)
         |GROUP BY f.doc_id, l.y)""".stripMargin
    sb.append(scoredCte("b", "b_")).append(",\n")
    sorted.indices.foreach(i => sb.append(scoredCte(s"a$i", s"a${i}_")).append(",\n"))
    def aucCte(name: String) =
      s"auc_$name AS (SELECT auc_milli FROM (${RankEval.aucSql(s"sc_$name")}))"
    sb.append(aucCte("b")).append(",\n")
    sb.append(sorted.indices.map(i => aucCte(s"a$i")).mkString(",\n")).append("\n")
    val rows = sorted.zipWithIndex.map { case (s0, i) =>
      s"""SELECT '$s0' AS source,
         |  (SELECT CAST(count(*) AS BIGINT) FROM documents d
         |   WHERE d.source = '$s0' AND d.doc_id NOT IN (SELECT doc_id FROM ev)) AS n_removed,
         |  (SELECT auc_milli FROM auc_a$i) AS auc_milli,
         |  (SELECT auc_milli FROM auc_b) AS base_auc_milli,
         |  (SELECT auc_milli FROM auc_b) - (SELECT auc_milli FROM auc_a$i) AS delta_milli""".stripMargin
    }
    sb.append(rows.mkString("", "\nUNION ALL\n", "\nORDER BY source"))
    sb.toString
  }
}
