package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.{SqDistLongExpr, TopKAgg}

/** Cluster-prototype selection: k-means the corpus embeddings, then
  * keep the `m` most central vectors of every cluster — the
  * "prototype" / centroid-nearest exemplars that density-based
  * curation pipelines feed downstream (per-cluster canonical
  * examples, semantic browse indexes, seed sets for human review).
  * The complement of [[KCenter]] (which picks maximally SPREAD
  * points): prototypes pick maximally TYPICAL points, per cluster.
  *
  * Scale shape: the quantizer is the integer-portable Lloyd's fit
  * from [[IvfIndex]] (model-sized driver state, one pass per
  * iteration); assignment + own-centroid distance is ONE narrow
  * zero-shuffle projection against literal centroids (the codegen'd
  * [[SqDistLongExpr]] argmin); per-cluster selection is the bounded
  * [[TopKAgg]] heap aggregate — the shuffle carries at most
  * `m · k` pairs per map task, never rows-to-a-window. Nothing in
  * the plan grows super-linearly with the corpus.
  *
  * Integer fixed-point end to end (floor(x·scale) quantization), so
  * the result is bit-exact across engines and partitionings and the
  * DuckDB twin ([[selectSql]]) hash-matches.
  */
object Prototypes {

  /** (cell, proto_rank, vec_id, sq_dist): the `m` vectors of each
    * k-means cell nearest their own centroid, proto_rank 1 = most
    * central; ties break to the smaller id. `sq_dist` is the integer
    * squared L2 in the quantized domain.
    */
  def select(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int,
      m: Int,
      scale: Long = 1000L): DataFrame = {
    require(k >= 1 && m >= 1, "k and m must be positive")
    val cents = IvfIndex.fitIntegerPortable(corpus, id, vec, k, iters, scale)
    val qv = IvfIndex.quantized(vec, scale)
    val dists = array(cents.map(c => SqDistLongExpr.sqDist(qv, typedLit(c.toSeq))): _*)
    corpus
      .select(id.cast("bigint").as("vec_id"), dists.as("dists"))
      .select(col("vec_id"),
        (array_position(col("dists"), array_min(col("dists"))) - 1).cast("int")
          .as("cell"),
        array_min(col("dists")).as("sq_dist"))
      // most central = smallest distance: TopKAgg keeps highest score
      // with ascending-id ties, so score = -dist gives (dist asc, id asc)
      .groupBy(col("cell"))
      .agg(TopKAgg.topK(-col("sq_dist"), col("vec_id"), m).as("top"))
      .select(col("cell"), posexplode(col("top")))
      .select(col("cell"), (col("pos") + 1).cast("bigint").as("proto_rank"),
        col("col.id").as("vec_id"), (-col("col.score")).cast("bigint").as("sq_dist"))
      .orderBy(col("cell"), col("proto_rank"))
  }

  /** DuckDB twin over the `embeddings` table (vec_id <> 0 corpus, the
    * [[IvfIndex.integerIvfCtes]] convention): composes on that
    * chain's `ivf(vid, v, cell)` assignments and `ivc{iters}`
    * centroids, re-deriving the assign-time distance and ranking per
    * cell. Bit-exact: every step is integer arithmetic on the same
    * floor(x·scale) quantization.
    */
  def selectSql(
      k: Int,
      iters: Int,
      m: Int,
      dim: Int = 64,
      scale: Long = 1000L): String = {
    val dist =
      s"list_aggregate(list_transform(range(1, ${dim + 1}), " +
        "i -> (q.qv[i]-c.cv[i])*(q.qv[i]-c.cv[i])), 'sum')"
    s"""WITH ${IvfIndex.integerIvfCtes(k, iters, nProbe = 1, topK = 1, dim, scale)},
       |prd AS (SELECT f.vid, f.cell, $dist AS dist
       |        FROM ivf f JOIN ivq q USING (vid) JOIN ivc$iters c ON f.cell = c.cell),
       |prr AS (SELECT cell, vid, dist,
       |          row_number() OVER (PARTITION BY cell ORDER BY dist, vid) AS rk
       |        FROM prd)
       |SELECT cell, CAST(rk AS BIGINT) AS proto_rank, vid AS vec_id,
       |  CAST(dist AS BIGINT) AS sq_dist
       |FROM prr WHERE rk <= $m
       |ORDER BY cell, proto_rank""".stripMargin
  }
}
