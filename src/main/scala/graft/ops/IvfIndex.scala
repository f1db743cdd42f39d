package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) ANN index: k-means coarse quantizer + cell
  * assignment. Queries probe only the nProbe nearest cells —
  * |corpus| · nProbe / k vectors scored instead of the full corpus.
  *
  * Training is Lloyd's algorithm with deterministic seeding (hash-
  * picked initial centroids), each iteration one distributed
  * assignment (mapPartitions over broadcast centroids — a numeric
  * kernel, the one place a closure beats expression trees) and one
  * groupBy-avg. Centroid count k is small (≤ thousands); the
  * centroid table always broadcasts.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length

    /** ids of the nProbe centroids nearest to `q` (driver-side — the
      * query vector is a single point).
      */
    def nearestCells(q: Array[Double], nProbe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) => (i, sqDist(q, c)) }
        .sortBy(_._2).take(nProbe).map(_._1).toSeq
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def nearestCentroid(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val d = sqDist(v, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train the coarse quantizer. Deterministic: initial centroids are
    * the k vectors with smallest xxhash64(id), iterations are fixed.
    */
  def fit(corpus: DataFrame, id: Column, vec: Column, k: Int, iters: Int = 5): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(id.cast("bigint").as("vid"), vec.cast("array<double>").as("v"))

    var centroids: Array[Array[Double]] = vecs
      .orderBy(xxhash64(col("vid")), col("vid"))
      .limit(k)
      .select(col("v")).as[Seq[Double]].collect().map(_.toArray)

    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assigned = vecs.as[(Long, Seq[Double])].mapPartitions { rows =>
        val cents = bc.value
        rows.map { case (_, v) => (nearestCentroid(v.toArray, cents), v) }
      }.toDF("cell", "v")
      val updated = assigned
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          array((0 until centroids(0).length).map(i => sum(element_at(col("v"), i + 1))): _*).as("sums"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getSeq[Double](2).toArray))
        .toMap
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        updated.get(c) match {
          case Some((n, sums)) if n > 0 => sums.map(_ / n)
          case _ => old // empty cell keeps its centroid
        }
      }
    }
    Model(centroids)
  }

  /** Assign each corpus vector to its IVF cell (persist this column —
    * at scale, write the corpus partitioned by `cell` so a probe
    * reads only nProbe partitions).
    */
  def assign(corpus: DataFrame, id: Column, vec: Column, model: Model): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.centroids)
    corpus.select(id.cast("bigint").as("vec_id"), vec.cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { rows =>
        val cents = bc.value
        rows.map { case (i, v) => (i, v, nearestCentroid(v.toArray, cents)) }
      }.toDF("vec_id", "v", "cell")
  }

  /** ANN top-k: score only vectors in the query's nProbe nearest
    * cells. `assigned` is the output of [[assign]]. The cell filter
    * prunes partitions before any per-vector math runs.
    */
  def topK(
      assigned: DataFrame,
      queryVec: Array[Double],
      k: Int,
      model: Model,
      nProbe: Int): DataFrame = {
    val cells = model.nearestCells(queryVec, nProbe)
    val q = typedLit(queryVec.toSeq)
    assigned
      .filter(col("cell").isin(cells: _*))
      .select(col("vec_id"),
        VectorFunctions.cosineSimilarity(col("v"), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
