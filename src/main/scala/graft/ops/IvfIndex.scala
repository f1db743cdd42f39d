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

  /** Train the coarse quantizer. Deterministic: the training set is
    * the `k * maxSamplePerCentroid` vectors with smallest
    * xxhash64(id) (a hash-ordered top-N — one TakeOrdered pass, no
    * global sort), and the k smallest of those seed the centroids.
    *
    * The sample is O(k · maxSamplePerCentroid · dim) — bounded by the
    * MODEL size, independent of corpus size — so it is collected once
    * and Lloyd's runs driver-local: ONE Spark job total, regardless
    * of `iters`; the corpus itself is scanned exactly once, later, by
    * [[assign]]. (This is how IVF quantizers train at scale
    * everywhere: the coarse codebook fits one machine by
    * construction.) For a quantizer too big for one machine
    * (k · dim in the billions) use [[fitDistributed]].
    */
  def fit(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int = 5,
      maxSamplePerCentroid: Int = 256): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val target = math.max(k, k * maxSamplePerCentroid)
    // TakeOrderedAndProject: rows arrive sorted by the hash order, so
    // the first k are exactly the seeds the distributed path picks.
    val sample: Array[Array[Double]] = corpus
      .select(id.cast("bigint").as("vid"), vec.cast("array<double>").as("v"))
      .orderBy(xxhash64(col("vid")), col("vid"))
      .limit(target)
      .select(col("v")).as[Seq[Double]].collect().map(_.toArray)
    if (sample.isEmpty) return Model(Array.empty)

    var centroids = sample.take(k).map(_.clone())
    val dim = centroids(0).length
    for (_ <- 0 until iters) {
      val cnt = new Array[Long](centroids.length)
      val sums = Array.ofDim[Double](centroids.length, dim)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        cnt(c) += 1
        var i = 0; while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (cnt(c) > 0) sums(c).map(_ / cnt(c))
        else old // empty cell keeps its centroid
      }
    }
    Model(centroids)
  }

  /** Distributed Lloyd's for quantizers whose sample exceeds one
    * machine: the cached bounded sample is re-scanned per iteration,
    * each iteration one job producing per-partition partial
    * (count, sum) arrays — k·dim numbers per partition, no shuffle,
    * no O(data) collect.
    */
  def fitDistributed(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int = 5,
      maxSamplePerCentroid: Int = 256): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val target = math.max(k, k * maxSamplePerCentroid)
    val sample = corpus
      .select(id.cast("bigint").as("vid"), vec.cast("array<double>").as("v"))
      .orderBy(xxhash64(col("vid")), col("vid"))
      .limit(target)
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()

    var centroids: Array[Array[Double]] = sample
      .orderBy(xxhash64(col("vid")), col("vid"))
      .limit(k)
      .select(col("v")).as[Seq[Double]].collect().map(_.toArray)
    if (centroids.isEmpty) { sample.unpersist(); return Model(Array.empty) }
    val dim = centroids(0).length

    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val (counts, sums) = sample.as[(Long, Seq[Double])].rdd
        .mapPartitions { rows =>
          val cents = bc.value
          val cnt = new Array[Long](cents.length)
          val sum = Array.ofDim[Double](cents.length, dim)
          rows.foreach { case (_, v) =>
            val a = v.toArray
            val c = nearestCentroid(a, cents)
            cnt(c) += 1
            var i = 0; while (i < dim) { sum(c)(i) += a(i); i += 1 }
          }
          Iterator.single((cnt, sum))
        }
        .reduce { case ((c1, s1), (c2, s2)) =>
          var c = 0
          while (c < c1.length) {
            c1(c) += c2(c)
            var i = 0; while (i < dim) { s1(c)(i) += s2(c)(i); i += 1 }
            c += 1
          }
          (c1, s1)
        }
      bc.unpersist()
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) > 0) sums(c).map(_ / counts(c))
        else old // empty cell keeps its centroid
      }
    }
    sample.unpersist()
    Model(centroids)
  }

  /** Persist the assigned corpus hive-partitioned by cell: a probe
    * then reads only its nProbe cell directories (partition pruning
    * before any I/O) — the 100 TB serving layout for this index.
    */
  def writeIndex(assigned: DataFrame, path: String): Unit =
    graft.gtfs.GtfsLake.writePartitioned(assigned, path, "cell")

  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

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
