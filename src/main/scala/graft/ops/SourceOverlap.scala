package graft.ops

import graft.util.PlanCache.Shareable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.{Md5Hash60Expr, MinHashMd5Expr, MinHashOps}

/** Pairwise source-overlap matrix: how much shingle content every
  * pair of corpus sources shares — the data-governance audit that
  * catches mirror sites, cross-source scrape duplication, and
  * benchmark bleed BETWEEN slices before any per-document dedup
  * runs. Two estimates per pair, side by side:
  *
  *  - `sketch_jaccard_milli`: per-source MinHash signature agreement
  *    (the mergeable sketch path — at 100 TB each source's signature
  *    is `numHashes` longs, maintainable incrementally, and the
  *    pairwise stage is O(sources²) on driver-scale data);
  *  - `exact_jaccard_milli`: exact |A∩B|/|A∪B| over distinct
  *    shingle hashes (one hash-keyed self-join — the calibration
  *    column that tells you whether to trust the sketch).
  *
  * Scale shape: text never shuffles — shingles collapse to 60-bit
  * md5 hashes before the distinct and the self-join; the per-source
  * signature is `numHashes` MIN aggregates (partial-agg citizens);
  * the pair stage joins two source-count-sized relations (bounded:
  * one row per source), so its non-equi join is a deliberate
  * bounded-input broadcast.
  */
object SourceOverlap {

  /** (src_a, src_b, n_common, n_union, exact_jaccard_milli,
    * sketch_jaccard_milli) for every unordered source pair,
    * src_a < src_b lexically.
    */
  def matrix(
      df: DataFrame,
      text: Column,
      source: Column,
      shingleK: Int = 3,
      numHashes: Int = 16): DataFrame = {
    require(numHashes >= 1, "numHashes must be positive")
    val sh = df.select(source.as("source"),
      TextAnalysis.wordShingles(text, shingleK).as("shingles"))

    // sketch: per-doc portable signature, per-source elementwise min
    val mins = (0 until numHashes).map(i =>
      min(element_at(col("__sig"), i + 1)).as(s"__m$i"))
    val srcSig = sh
      .select(col("source"),
        MinHashMd5Expr.minhashSig(col("shingles"), numHashes).as("__sig"))
      .groupBy(col("source"))
      .agg(mins.head, mins.tail: _*)

    // exact: distinct (source, shingle-hash) — 8-byte keys only
    val ds = sh
      .select(col("source"), explode(col("shingles")).as("s"))
      .select(col("source"), Md5Hash60Expr.hash60(col("s")).as("h"))
      .distinct()
      .sharedPersist()
    val cnt = ds.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val com = ds.alias("a")
      .join(ds.alias("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))

    val matches = (0 until numHashes)
      .map(i => when(col(s"x.__m$i") === col(s"y.__m$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    srcSig.alias("x")
      .join(broadcast(srcSig.alias("y")), col("x.source") < col("y.source"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
        matches.as("__matches"))
      .join(broadcast(cnt.select(col("source").as("src_a"), col("n").as("__na"))), Seq("src_a"))
      .join(broadcast(cnt.select(col("source").as("src_b"), col("n").as("__nb"))), Seq("src_b"))
      .join(com, Seq("src_a", "src_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("n_union", col("__na") + col("__nb") - col("n_common"))
      .select(col("src_a"), col("src_b"), col("n_common"), col("n_union"),
        expr("n_common * 1000 div n_union").as("exact_jaccard_milli"),
        expr(s"__matches * 1000 div $numHashes").as("sketch_jaccard_milli"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** DuckDB twin over `documents(text, source)`: the same shingle
    * set, md5-affine hash family, per-source flattened minima, and
    * integer-milli divisions.
    */
  def matrixSql(shingleK: Int = 3, numHashes: Int = 16): String = {
    require(shingleK == 3, "twin is written for the k=3 shingle CTE")
    val p = MinHashOps.P
    val minCols = (0 until numHashes).map { i =>
      s"min((${MinHashOps.affineA(i)} * (h60 % $p) + ${MinHashOps.affineB(i)}) % $p) AS m$i"
    }.mkString(",\n          ")
    val matchSum = (0 until numHashes)
      .map(i => s"CASE WHEN x.m$i = y.m$i THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    s"""WITH tok AS (SELECT doc_id, source,
       |              string_split_regex(trim(lower(text)), '\\s+') AS toks
       |            FROM documents),
       |shg AS (SELECT doc_id, source,
       |          list_distinct(CASE WHEN len(toks) >= 3
       |            THEN list_transform(range(1, len(toks) - 1),
       |                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |            ELSE [array_to_string(toks, ' ')] END) AS shingles
       |        FROM tok),
       |fl AS (SELECT source, ('0x' || substr(md5(u.s), 1, 15))::BIGINT AS h60
       |       FROM shg, unnest(shingles) AS u(s)),
       |sig AS (SELECT source,
       |          $minCols
       |        FROM fl GROUP BY source),
       |ds AS (SELECT DISTINCT source, h60 AS h FROM fl),
       |cnt AS (SELECT source, count(*) AS n FROM ds GROUP BY source),
       |com AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
       |        FROM ds a JOIN ds b ON a.h = b.h AND a.source < b.source
       |        GROUP BY 1, 2),
       |prs AS (SELECT x.source AS src_a, y.source AS src_b, $matchSum AS matches
       |        FROM sig x JOIN sig y ON x.source < y.source)
       |SELECT p.src_a, p.src_b,
       |  coalesce(c.n_common, 0) AS n_common,
       |  na.n + nb.n - coalesce(c.n_common, 0) AS n_union,
       |  coalesce(c.n_common, 0) * 1000 // (na.n + nb.n - coalesce(c.n_common, 0))
       |    AS exact_jaccard_milli,
       |  p.matches * 1000 // $numHashes AS sketch_jaccard_milli
       |FROM prs p
       |JOIN cnt na ON na.source = p.src_a
       |JOIN cnt nb ON nb.source = p.src_b
       |LEFT JOIN com c ON c.src_a = p.src_a AND c.src_b = p.src_b
       |ORDER BY p.src_a, p.src_b""".stripMargin
  }
}
