package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a single scan + per-row
  * dot product + TakeOrderedAndProject (no global sort, no shuffle
  * of the corpus).
  *
  * Scale path: random-hyperplane LSH bucketing — candidates restricted
  * to the query's bucket (plus hamming-1 neighbor buckets for recall),
  * so a 100 TB corpus probes |corpus|/2^planes vectors per query.
  */
object Similarity {

  /** Brute-force cosine top-k against a single query vector carried in
    * a one-row frame (broadcast). Returns (id, cos_sim) ordered desc.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      query: DataFrame, // one row, column "qv"
      k: Int): DataFrame =
    corpus.select(id.as("vec_id"), vec.as("v"))
      .crossJoin(broadcast(query))
      .select(col("vec_id"),
        VectorFunctions.cosineSimilarity(col("v"), col("qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)

  /** Batched brute-force cosine top-k: score MANY query vectors in
    * ONE corpus pass. The query set broadcasts (it is the small
    * side); each corpus partition scores all queries locally and
    * keeps a bounded per-query top-k (the combiner — at most
    * partitions × |queries| × k rows ever reach the shuffle, never
    * the scored corpus); a final ranked window over that small set
    * picks the global top-k per query. A 100 TB corpus is scanned
    * once for the whole batch instead of once per query.
    * Returns (query_id, vec_id, cos_sim), top-k per query.
    */
  def bruteForceTopKBatch(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      queries: DataFrame, // columns: query_id (bigint), qv
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // The scoring work is |corpus| × |queries| — far larger than the
    // corpus scan that feeds it. A small corpus parquet arrives in a
    // handful of input splits, which would leave most cores idle for
    // the quadratic part; spread it first when under-partitioned. At
    // real scale the corpus already has >> cores partitions and this
    // is a no-op (no shuffle added).
    val cores = spark.sparkContext.defaultParallelism
    val base = corpus.select(id.cast("bigint").as("vec_id"), vec.as("v"))
    val spread =
      if (base.rdd.getNumPartitions < cores) base.repartition(cores) else base
    val scored = spread
      .crossJoin(broadcast(queries.select(col("query_id").cast("bigint"), col("qv"))))
      .select(col("query_id"), col("vec_id"),
        VectorFunctions.cosineSimilarity(col("v"), col("qv")).as("cos_sim"))
    topKPerQuery(scored, k)
  }

  /** Bounded per-query top-k over an already-scored
    * (query_id, vec_id, cos_sim) stream — the combiner half of
    * [[bruteForceTopKBatch]], exposed so callers that can score each
    * pair ONCE (e.g. margin mining, where every corpus row is also a
    * query in the other direction) reuse the scored set for both
    * rankings instead of recomputing the quadratic cosine pass.
    */
  def topKPerQuery(scoredDf: DataFrame, k: Int): DataFrame = {
    val spark = scoredDf.sparkSession
    import spark.implicits._
    val scored = scoredDf.as[(Long, Long, Double)]

    // partial top-k per (partition, query): a bounded ordered buffer
    // per query id — the map-side combine Spark's window can't do.
    // PriorityQueue, NOT TreeSet: a set would collapse duplicate
    // (vec_id, sim) corpus rows into one entry and return fewer
    // candidates than bruteForceTopK, which keeps both.
    val partial = scored.mapPartitions { rows =>
      // max under this ordering = WORST candidate (lowest cos_sim,
      // then largest vec_id) — exactly what the bound evicts. Field
      // comparisons, NOT Ordering.by(tuple): the by-form allocates a
      // key tuple on EVERY comparison, and this loop runs
      // |corpus|×|queries| times at the margin-mining call sites.
      val ord: Ordering[(Long, Long, Double)] =
        new Ordering[(Long, Long, Double)] {
          def compare(a: (Long, Long, Double), b: (Long, Long, Double)): Int = {
            val bySim = java.lang.Double.compare(b._3, a._3) // lower sim = greater
            if (bySim != 0) bySim else java.lang.Long.compare(a._2, b._2)
          }
        }
      // LongMap: unboxed keys — this lookup runs once per SCORED row
      // (|corpus|×|queries| times), where a boxed HashMap's per-row
      // Long allocation dominates the whole batch at the margin-
      // mining call sites (every corpus row is also a query)
      val heaps = scala.collection.mutable.LongMap.empty[scala.collection.mutable.PriorityQueue[(Long, Long, Double)]]
      rows.foreach { r =>
        val h = heaps.getOrElseUpdate(r._1, scala.collection.mutable.PriorityQueue.empty(ord))
        if (h.size < k) h += r
        else if (ord.lt(r, h.head)) { // beats the worst kept candidate
          h.dequeue()
          h += r
        }
        // else: one compare, no heap churn — the steady-state path
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }.toDF("query_id", "vec_id", "cos_sim")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    partial
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** Deterministic random hyperplanes (fixed seed — reproducible
    * across sessions and executors).
    */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket of a vector under the given hyperplanes: bit i set
    * iff v·plane_i >= 0. Pure column expression.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorFunctions.dotProduct(vec, typedLit(p)) >= 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN top-k: score only vectors whose bucket is
    * within hamming distance `probeHamming` of the query's bucket.
    * With h planes this prunes the corpus ~2^h-fold at probeHamming=0.
    */
  def lshTopK(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      query: DataFrame, // one row, column "qv"
      k: Int,
      dim: Int,
      nPlanes: Int = 8,
      probeHamming: Int = 1): DataFrame = {
    val planes = hyperplanes(dim, nPlanes)
    val bucketed = corpus.select(id.as("vec_id"), vec.as("v"),
      lshBucket(vec, planes).as("bucket"))
    val q = broadcast(query.select(col("qv"), lshBucket(col("qv"), planes).as("q_bucket")))
    bucketed.join(q,
        bit_count(col("bucket").bitwiseXOR(col("q_bucket"))) <= probeHamming)
      .select(col("vec_id"),
        VectorFunctions.cosineSimilarity(col("v"), col("qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Persist the LSH index: the corpus written PARTITIONED BY its
    * sign-bucket, so a probe's partition filter reads only the
    * query-adjacent buckets from disk (mirrors IvfIndex.writeIndex —
    * the C7 analog of A26's partition pruning). The bucketing is
    * data-independent (fixed seeded hyperplanes), so the index never
    * needs refitting as the corpus grows — new shards append into
    * the same bucket layout.
    */
  def writeLshIndex(corpus: DataFrame, id: Column, vec: Column, path: String,
      dim: Int, nPlanes: Int = 8): Unit = {
    val planes = hyperplanes(dim, nPlanes)
    graft.gtfs.GtfsLake.writePartitioned(
      corpus.select(id.as("vec_id"), vec.as("v"), lshBucket(vec, planes).as("bucket")),
      path, "bucket")
  }

  /** Probe a persisted LSH index: the bucket predicate is a literal
    * IN-list over the query's hamming-≤probeHamming neighborhood, so
    * it prunes PARTITIONS at the scan (PartitionFilters), reading
    * 1 + nPlanes files' worth of a 2^nPlanes-bucket layout for
    * probeHamming = 1.
    */
  def probeLshIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      query: DataFrame, k: Int, dim: Int, nPlanes: Int = 8,
      probeHamming: Int = 1): DataFrame = {
    val planes = hyperplanes(dim, nPlanes)
    // one-row contract (same as lshTopK): partition pruning is
    // derived from THE query's bucket — a multi-row frame would
    // silently prune away other rows' neighborhoods
    val qRows = query.select(lshBucket(col("qv"), planes).as("q_bucket")).head(2)
    require(qRows.length == 1,
      s"probeLshIndex expects exactly one query row with column qv, got ${qRows.length}")
    val qBucket = qRows(0).getLong(0)
    val probeBuckets = (0 until (1 << nPlanes))
      .filter(b => java.lang.Long.bitCount(b.toLong ^ qBucket) <= probeHamming)
      .map(_.toLong)
    spark.read.parquet(path)
      .filter(col("bucket").isin(probeBuckets: _*))
      .crossJoin(broadcast(query.select(col("qv"))))
      .select(col("vec_id"),
        VectorFunctions.cosineSimilarity(col("v"), col("qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
