package graft.ops

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
