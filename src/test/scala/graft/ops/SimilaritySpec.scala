package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("brute-force top-k ranks by cosine") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val query = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("qv")
    val top = Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"), query, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L))
  }

  test("lsh top-k achieves >=0.6 recall vs brute force on real embeddings") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"), query, 20)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(corpus, col("vec_id"), col("embedding"), query,
        k = 20, dim = 64, nPlanes = 6, probeHamming = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low")
  }

  test("ivf top-k achieves >=0.6 recall probing half the cells") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"), query, 20)
      .collect().map(_.getLong(0)).toSet
    val qv = query.first().getSeq[Float](0).map(_.toDouble).toArray
    val model = IvfIndex.fit(corpus, col("vec_id"), col("embedding"), k = 8, iters = 5)
    val assigned = IvfIndex.assign(corpus, col("vec_id"), col("embedding"), model)
    val ivf = IvfIndex.topK(assigned, qv, 20, model, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"ivf recall $recall too low")
    // cells partition the corpus
    assert(assigned.select("cell").distinct().count() <= 8)
    assert(assigned.count() == corpus.count())
  }

  test("random projection matches an in-memory reference and preserves distances") {
    import graft.functions.VectorFunctions
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings").limit(40)
    val got = emb.select(col("vec_id"),
        VectorFunctions.randomProject(col("embedding"), 64, 16).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val orig = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // parity with a driver-side multiply (same left-to-right sums)
    val rows = VectorFunctions.projectionMatrix(64, 16)
    val scale = 1.0 / math.sqrt(16)
    orig.foreach { case (id, v) =>
      val expect = rows.map(r => r.zip(v).foldLeft(0.0) { case (a, (x, y)) => a + x * y } * scale)
      assert(expect.zip(got(id).toSeq).forall { case (a, b) => a == b }, s"vec $id")
    }
    // JL: projected distances track original distances (loose at 16 dims)
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ids = orig.keys.toSeq.sorted.take(20)
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      d0 = dist(orig(ids(i)), orig(ids(j))) if d0 > 1e-9
    } yield dist(got(ids(i)), got(ids(j))) / d0
    val sortedR = ratios.sorted
    val median = sortedR(sortedR.size / 2)
    assert(median > 0.6 && median < 1.6, s"median ratio $median")
    assert(ratios.count(r => r < 0.2 || r > 3.0) < ratios.size / 10)
  }

  test("batched top-k equals per-query brute force for every query in the batch") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val queryIds = Seq(0L, 1L, 2L)
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.filter(!col("vec_id").isin(queryIds: _*))
    val batch = Similarity.bruteForceTopKBatch(corpus, col("vec_id"), col("embedding"), queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(x => (-x._3, x._2)).map(_._2).toSeq).toMap
    queryIds.foreach { qid =>
      val single = Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"),
          emb.filter(col("vec_id") === qid).select(col("embedding").as("qv")), k = 10)
        .collect().map(_.getLong(0)).toSeq
      assert(batch(qid) == single, s"query $qid")
    }
  }

  test("batched top-k keeps duplicate corpus vec_id rows, matching per-query brute force") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // duplicate the query's top-3 neighbors: both copies must appear
    val base = emb.filter(col("vec_id") =!= 0)
    val top3 = Similarity.bruteForceTopK(base, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") === 0).select(col("embedding").as("qv")), k = 3)
      .collect().map(_.getLong(0))
    val corpus = base.union(base.filter(col("vec_id").isin(top3: _*)))
    val batch = Similarity.bruteForceTopKBatch(corpus, col("vec_id"), col("embedding"), query, k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(x => (-x._2, x._1)).toSeq
    val single = Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") === 0).select(col("embedding").as("qv")), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(batch == single)
    // the duplicated ids really do appear twice when they make the cut
    val dupIds = single.groupBy(_._1).collect { case (id, rs) if rs.size > 1 => id }
    assert(dupIds.nonEmpty, "test corpus should place a duplicated id in the top-10")
  }

  test("integer-portable ivf: usable recall vs brute force, repartition-stable") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"), query, 20)
      .collect().map(_.getLong(0)).toSet
    val got = IvfIndex.integerIvfTopK(corpus, col("vec_id"), col("embedding"), query,
        k = 8, iters = 3, nProbe = 4, topK = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // probing half the cells: expect at least half the true top-20
    assert((got.map(_._1).toSet & exact).size >= 10,
      s"recall too low: ${(got.map(_._1).toSet & exact).size}/20")
    // deterministic under a different input partitioning
    val got2 = IvfIndex.integerIvfTopK(corpus.repartition(7), col("vec_id"), col("embedding"),
        query, k = 8, iters = 3, nProbe = 4, topK = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == got2.toSeq)
  }

  test("ivf distributed fit trains an equivalent quantizer (same seeds, usable recall)") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"), query, 20)
      .collect().map(_.getLong(0)).toSet
    val qv = query.first().getSeq[Float](0).map(_.toDouble).toArray
    val local = IvfIndex.fit(corpus, col("vec_id"), col("embedding"), k = 8, iters = 0)
    val dist = IvfIndex.fitDistributed(corpus, col("vec_id"), col("embedding"), k = 8, iters = 0)
    // at iters=0 both are exactly the seed centroids — the same
    // hash-ordered k rows regardless of which path picked them
    assert(local.centroids.map(_.toSeq).toSeq == dist.centroids.map(_.toSeq).toSeq)
    val model = IvfIndex.fitDistributed(corpus, col("vec_id"), col("embedding"), k = 8, iters = 5)
    val assigned = IvfIndex.assign(corpus, col("vec_id"), col("embedding"), model)
    val ivf = IvfIndex.topK(assigned, qv, 20, model, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"distributed-fit ivf recall $recall too low")
  }

  test("ivf persisted index: probe reads only its cells (partition pruning)") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.filter(col("vec_id") =!= 0)
    val model = IvfIndex.fit(corpus, col("vec_id"), col("embedding"), k = 8, iters = 3)
    val assigned = IvfIndex.assign(corpus, col("vec_id"), col("embedding"), model)
    val path = java.nio.file.Files.createTempDirectory("ivf_index").toString + "/idx"
    IvfIndex.writeIndex(assigned, path)

    val qv = emb.filter(col("vec_id") === 0).first()
      .getSeq[Float](emb.columns.indexOf("embedding")).map(_.toDouble).toArray
    val onDisk = IvfIndex.readIndex(spark, path)
    val probed = IvfIndex.topK(onDisk, qv, 20, model, nProbe = 4)
    // identical results from the persisted layout
    val fromMem = IvfIndex.topK(assigned, qv, 20, model, nProbe = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(probed.collect().map(_.getLong(0)).toSeq == fromMem)
    // the cell filter reaches the scan as a PartitionFilter: only the
    // probed cell directories are read
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected partition pruning on cell, plan:\n$plan")
  }

  test("lsh bucket prunes the candidate set") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val planes = Similarity.hyperplanes(64, 8)
    val buckets = emb.select(Similarity.lshBucket(col("embedding"), planes).as("b"))
      .groupBy("b").count()
    // 500 vectors should spread over many of the buckets
    assert(buckets.count() > 32)
  }

  test("lsh persisted index: probe matches in-flight lshTopK and prunes partitions") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") =!= 0)
    val path = java.nio.file.Files.createTempDirectory("lsh_index").toString + "/idx"
    Similarity.writeLshIndex(corpus, col("vec_id"), col("embedding"), path, dim = 64)

    val probed = Similarity.probeLshIndex(spark, path, query, k = 20, dim = 64)
    val inFlight = Similarity.lshTopK(corpus, col("vec_id"), col("embedding"), query, 20, dim = 64)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq
    assert(probed.collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq
      == inFlight)

    // bucket IN-list reaches the scan as a PartitionFilter: only the
    // hamming-neighborhood directories are read
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected partition pruning on bucket, plan:\n$plan")
  }
}
