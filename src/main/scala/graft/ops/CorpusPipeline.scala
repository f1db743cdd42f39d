package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composition every
  * 100 TB data pipeline runs, wired from the individually oracled
  * operators. Stages, in the order that minimizes work carried
  * forward (cheap narrow filters first, pair-generating stages last,
  * over the smallest surviving set):
  *
  *  1. scrub text (URLs/emails/tags/whitespace)      — narrow map
  *  2. language filter (n-gram heuristic)            — narrow filter
  *  3. quality filter (length/token/punct flags)     — narrow filter
  *  3b. repetition filter (Gopher-style bigram caps) — narrow filter
  *  3c. eval-set contamination filter (broadcast)    — broadcast join
  *  3d. URL canonical dedup + per-domain cap (C52/C55, when a URL
  *      column is supplied)                          — keyed shuffles
  *  4. exact dedup (md5 groupBy, min-id survivor)    — 1 shuffle
  *  4b. prefix-dup screen (C56, optional — catches template stamps
  *      cheaply before the banded stage)             — 1 shuffle
  *  5. near-dup removal: MinHash-LSH pairs → connected components →
  *     keep each cluster's minimum id                — banded shuffles
  *  6. deterministic hash sampling                   — narrow filter
  *  7. token counting + sequence packing per shard   — 1 shuffle
  *
  * Every stage is deterministic, so the whole pipeline is
  * reproducible: same corpus in, same packed corpus out, on any
  * cluster size.
  */
object CorpusPipeline {

  final case class Config(
      langs: Set[String] = Set("en"),
      minQuality: Int = 2,
      maxTopBigramFrac: Double = 1.0, // 1.0 disables the repetition cap
      nearDupThreshold: Double = 0.7,
      sampleFraction: Double = 1.0,
      maxTokens: Int = 4096,
      maxDocsPerDomain: Option[Int] = None, // needs urlCol in prepare()
      prefixDedupK: Option[Int] = None)

  /** @param docs columns: doc_id (bigint), text, source
    * @param evalSet optional benchmark documents (a `text` column);
    *        docs whose shingle overlap with it reaches
    *        contaminationFrac are dropped (decontamination)
    * @return surviving documents with scrubbed text and packing
    *         columns: doc_id, source, text, lang, n_tokens,
    *         start_offset, chunk_id
    */
  /** Pipeline funnel report — the data-card accounting every curation
    * run prints: how many documents (and tokens) each gate removes,
    * with every document attributed to the FIRST stage that drops it
    * (sequential-filter semantics, matching [[prepare]]'s order:
    * lang → quality → repetition → exact-dup → prefix-dup →
    * near-dup → kept). One row per stage including zero rows, so the
    * funnel shape is stable across runs and diffable.
    *
    * Scale shape: ONE wide pass computes every narrow gate signal
    * (langid, quality flags, repetition, fingerprint, token count)
    * per document; the dedup keep decisions are the same
    * fixed-width-key partial aggs as the pipeline itself; the exit
    * label is a chain of left joins on doc_id against the (small)
    * drop sets; the report is a |stages| aggregate. The corpus is
    * read once — the naive per-stage `count()` formulation reads it
    * once PER STAGE.
    *
    * `nearDupPairs`: optional near-dup pair set computed over the
    * docs that survive the earlier stages (the caller owns the LSH
    * parameters); omitted = the near_dup stage reports zero.
    */
  def funnel(docs: DataFrame, cfg: Config = Config(),
      nearDupPairs: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (lenOk, tokOk, punctOk) = TextAnalysis.qualityFlags(col("text"))
    val repFrac = TextAnalysis.repetitionMetrics(col("text"))
      .toMap.apply("top_bigram_frac")
    val base = docs.select(col("doc_id").cast("bigint").as("doc_id"),
        col("text"),
        TextAnalysis.langId(col("text")).as("lang"),
        (lenOk + tokOk + punctOk).as("q"),
        repFrac.as("rep"),
        md5(col("text")).as("fp"),
        TextAnalysis.tokenCount(col("text")).as("n_toks"))
      .sharedPersist()
    val langOk = col("lang").isin(cfg.langs.toSeq: _*)
    val qOk = col("q") >= cfg.minQuality
    val repOk = if (cfg.maxTopBigramFrac >= 1.0) lit(true)
      else col("rep") <= cfg.maxTopBigramFrac

    val s3 = base.filter(langOk && qOk && repOk)
    val withKeep = s3.join(
      s3.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id")), Seq("fp"))
    val exactDrops = withKeep.filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"))
    val s4 = withKeep.filter(col("doc_id") === col("keep_id")).drop("keep_id")

    val prefixDrops = cfg.prefixDedupK match {
      case None => s4.select(col("doc_id")).limit(0)
      case Some(k) =>
        val groups = Dedup.prefixGroups(s4, col("doc_id"), col("text"), k)
        s4.select(col("doc_id"),
            md5(array_join(slice(split(trim(lower(col("text"))), "\\s+"), 1, k), " "))
              .as("prefix_md5"))
          .join(groups, Seq("prefix_md5"))
          .filter(col("doc_id") =!= col("kept_doc"))
          .select(col("doc_id"))
    }
    val nearDrops = nearDupPairs match {
      case None => s4.select(col("doc_id")).limit(0)
      case Some(pairs) => DupClusters.survivors(pairs)
        .filter(!col("keep")).select(col("doc_id"))
    }

    def flag(ids: DataFrame, name: String): DataFrame =
      ids.select(col("doc_id"), lit(true).as(name))
    val labeled = base
      .join(flag(exactDrops, "__e"), Seq("doc_id"), "left")
      .join(flag(prefixDrops, "__p"), Seq("doc_id"), "left")
      .join(flag(nearDrops, "__n"), Seq("doc_id"), "left")
      .select(
        when(!langOk, "lang").when(!qOk, "quality").when(!repOk, "repetition")
          .when(col("__e"), "exact_dup").when(col("__p"), "prefix_dup")
          .when(col("__n"), "near_dup").otherwise("kept").as("stage"),
        col("n_toks"))
    val stages = Seq("lang" -> 1L, "quality" -> 2L, "repetition" -> 3L,
      "exact_dup" -> 4L, "prefix_dup" -> 5L, "near_dup" -> 6L, "kept" -> 7L)
      .toDF("stage", "stage_rank")
    stages.join(
        labeled.groupBy(col("stage"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens")),
        Seq("stage"), "left")
      .select(col("stage_rank"), col("stage"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  def prepare(docs: DataFrame, cfg: Config = Config(),
      evalSet: Option[DataFrame] = None,
      contaminationFrac: Double = 0.5,
      urlCol: Option[String] = None): DataFrame = {
    // 1-3: narrow scrub + filters, one pass over the scan
    val carried = Seq(col("doc_id").cast("bigint").as("doc_id"),
      col("source"), TextCleaner.scrubAll(col("text")).as("text")) ++
      urlCol.map(col).toSeq
    val scrubbed = docs.select(carried: _*)
      .withColumn("lang", TextAnalysis.langId(col("text")))
      .filter(col("lang").isin(cfg.langs.toSeq: _*))
    val (lenOk, tokOk, punctOk) = TextAnalysis.qualityFlags(col("text"))
    val quality = scrubbed.filter(lenOk + tokOk + punctOk >= cfg.minQuality)

    // 3b: repetition cap — still inside the same narrow scan pass
    val unrepeated =
      if (cfg.maxTopBigramFrac >= 1.0) quality
      else {
        val frac = TextAnalysis.repetitionMetrics(col("text"))
          .toMap.apply("top_bigram_frac")
        quality.filter(frac <= cfg.maxTopBigramFrac)
      }

    // 3c: decontamination against the (broadcast-small) eval set
    val decontaminated = evalSet match {
      case None => unrepeated
      case Some(ev) =>
        val flagged = Contamination.overlap(unrepeated, col("doc_id"), col("text"),
            ev, col("text"), shingleK = 3, minFrac = contaminationFrac)
          .filter(col("contaminated") === 1)
          .select(col("doc_id"))
        unrepeated.join(flagged, Seq("doc_id"), "left_anti")
    }

    // 3d: URL-keyed curation — canonical-duplicate removal, then the
    // per-domain cap, both keep-smallest deterministic
    val domainCurated = urlCol match {
      case None => decontaminated
      case Some(u) =>
        val canonKeep = DomainCuration.urlDedup(decontaminated, col(u), col("doc_id"))
          .select(col("kept_doc").as("doc_id"))
        val urlDeduped = decontaminated.join(canonKeep, Seq("doc_id"), "left_semi")
        cfg.maxDocsPerDomain match {
          case None => urlDeduped
          case Some(n) =>
            val capKeep = DomainCuration.capPerDomain(urlDeduped, col(u), col("doc_id"), n)
              .select(col("doc_id"))
            urlDeduped.join(capKeep, Seq("doc_id"), "left_semi")
        }
    }

    // 4: exact dedup — min doc_id survives per distinct content
    val exactDeduped0 = Dedup.exactRows(domainCurated, col("doc_id"), col("text"))

    // 4b: prefix-dup screen — drop every non-kept member of a shared
    // first-k-token group before the (costlier) banded near-dup stage
    val exactDeduped = cfg.prefixDedupK match {
      case None => exactDeduped0
      case Some(k) =>
        val groups = Dedup.prefixGroups(exactDeduped0, col("doc_id"), col("text"), k)
        val keyed = exactDeduped0.select(col("doc_id"),
          md5(array_join(slice(split(trim(lower(col("text"))), "\\s+"), 1, k), " "))
            .as("prefix_md5"))
        val drops = keyed.join(groups, Seq("prefix_md5"))
          .filter(col("doc_id") =!= col("kept_doc"))
          .select(col("doc_id"))
        exactDeduped0.join(drops, Seq("doc_id"), "left_anti")
    }

    // 5: near-dup clusters — drop every member except the cluster min
    val pairs = Dedup.minHashLshAuto(exactDeduped, col("doc_id"), col("text"),
        threshold = cfg.nearDupThreshold)
      .select(col("id_a"), col("id_b"))
    val removals = DupClusters.survivors(pairs)
      .filter(!col("keep"))
      .select(col("doc_id"))
    val nearDeduped = exactDeduped.join(removals, Seq("doc_id"), "left_anti")

    // 6: reproducible subsetting
    val sampled =
      if (cfg.sampleFraction >= 1.0) nearDeduped
      else Sampling.hashSample(nearDeduped, col("doc_id"), cfg.sampleFraction)

    // 7: token counts + concat-then-chunk packing per source shard
    val withTokens = sampled.withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
    Packing.packChunks(withTokens, col("source"), col("doc_id"), col("n_tokens"), cfg.maxTokens)
      .select(col("doc_id"), col("source"), col("text"), col("lang"),
        col("n_tokens"), col("start_offset"), col("chunk_id"))
  }
}
