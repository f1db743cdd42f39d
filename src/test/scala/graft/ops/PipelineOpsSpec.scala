package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Specs for the corpus-assembly operators: deterministic sampling,
  * sequence packing, duplicate-cluster resolution.
  */
class PipelineOpsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private lazy val docs =
    graft.Tables.read(spark, "/root/testdata/sf0.001", "documents").persist()

  test("hash sample is deterministic, order-independent, and near the target fraction") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.orderBy(col("n_chars")), col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // same sample regardless of input order
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.08 && frac < 0.35, s"fraction $frac") // ~0.2 at n=50..100
    // nested property: a smaller fraction is a subset of a larger one
    val smaller = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(a))
  }

  test("stratified sample returns exactly n per group (or the whole small group)") {
    val sizes = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"), 3)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val groupSizes = docs.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    groupSizes.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(3L, n), s"lang $lang")
    }
  }

  test("mixture sample applies per-source fractions") {
    val mixed = Sampling.mixtureSample(docs, col("source"), col("doc_id"),
      Map("web" -> 1.0, "books" -> 0.0))
    val bySource = mixed.groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (all.contains("web")) assert(bySource("web") == all("web")) // fraction 1.0 keeps all
    assert(!bySource.contains("books")) // fraction 0 drops all
    assert(bySource.keySet.subsetOf(Set("web"))) // unlisted sources dropped
  }

  test("split assignment is disjoint, exhaustive, and consistent with hash sampling") {
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val assigned = docs.select(col("doc_id"),
      Sampling.assignSplit(col("doc_id"), splits).as("split")).persist()
    // exhaustive: every row gets exactly one of the declared labels
    assert(assigned.count() == docs.count())
    val labels = assigned.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "valid", "test")))
    // prefix property: the train split IS the 0.8 hash sample (so a
    // corpus sampled at f and a split with train=f select identical rows)
    val train = assigned.filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hs = Sampling.hashSample(docs, col("doc_id"), 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(train == hs)
    // growth stability: assignments computed on a subset agree with the full corpus
    val sub = docs.filter(col("doc_id") % 2 === 0)
    val subAssigned = sub.select(col("doc_id"),
      Sampling.assignSplit(col("doc_id"), splits).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = assigned.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subAssigned.foreach { case (id, sp) => assert(full(id) == sp) }
    assigned.unpersist()
  }

  test("split bounds give the remainder of the hash space to the last label") {
    val bounds = Sampling.splitBounds(Seq("a" -> 0.5, "b" -> 0.25))
    assert(bounds == Seq("a" -> (Sampling.HashSpace / 2), "b" -> Sampling.HashSpace))
    // fractions summing to 1 also end exactly at the top of the space
    val exact = Sampling.splitBounds(Seq("x" -> 0.9, "y" -> 0.1))
    assert(exact.last._2 == Sampling.HashSpace)
    intercept[IllegalArgumentException] {
      Sampling.splitBounds(Seq("a" -> 0.9, "b" -> 0.2)) // sums past 1
    }
  }

  test("chunking emits the exact sliding windows, and the plan is a zero-shuffle narrow map") {
    import spark.implicits._
    // 10 tokens, size 4, overlap 1 -> stride 3: starts 0,3,6,9
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val got = Chunking.chunk(d, col("doc_id"), col("text"), size = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == Set(
      (1L, 0L, 0L, 4L, m("t0 t1 t2 t3")),
      (1L, 1L, 3L, 4L, m("t3 t4 t5 t6")),
      (1L, 2L, 6L, 4L, m("t6 t7 t8 t9")),
      (1L, 3L, 9L, 1L, m("t9")),
      (2L, 0L, 0L, 1L, m("")), // empty text = one empty token
      (3L, 0L, 0L, 2L, m("a b"))))
    // consecutive chunks share exactly `overlap` tokens by construction
    val docs01 = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val plan = Chunking.chunk(docs01, col("doc_id"), col("text"), 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("packing matches a sequential fold per shard") {
    val d = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 4000L), ("s1", 3L, 50L), ("s1", 4L, 8000L),
      ("s2", 10L, 4096L), ("s2", 11L, 1L))
      .toDF("src", "doc_id", "n_tokens")
    val packed = Packing.packChunks(d, col("src"), col("doc_id"), col("n_tokens"), 4096)
      .select("src", "doc_id", "start_offset", "chunk_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // s1 offsets: 0, 100, 4100, 4150 -> chunks 0, 0, 1, 1
    // s2 offsets: 0, 4096          -> chunks 0, 1
    assert(packed == Set(
      ("s1", 1L, 0L, 0L), ("s1", 2L, 100L, 0L), ("s1", 3L, 4100L, 1L), ("s1", 4L, 4150L, 1L),
      ("s2", 10L, 0L, 0L), ("s2", 11L, 4096L, 1L)))
    val stats = Packing.chunkStats(
      Packing.packChunks(d, col("src"), col("doc_id"), col("n_tokens"), 4096),
      col("src"), col("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(stats(("s1", 0L)) == (2L, 4100L))
    assert(stats(("s1", 1L)) == (2L, 8050L))
  }

  test("plan shapes: sampling is shuffle-free, stratified/packing shuffle once on their keys") {
    // hash sampling: a narrow filter over the scan — zero exchanges
    val hs = Sampling.hashSample(docs, col("doc_id"), 0.5)
    assert(!hs.queryExecution.executedPlan.toString.contains("Exchange"),
      hs.queryExecution.executedPlan.toString)

    // stratified sample: exactly one shuffle (the group-key window)
    val ss = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"), 3)
    val ssPlan = ss.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(ssPlan).size == 1, ssPlan)

    // packing: exactly one shuffle (the shard-key window)
    val pk = Packing.packChunks(
      docs.select(col("doc_id"), col("source"), col("n_chars").as("n_tokens")),
      col("source"), col("doc_id"), col("n_tokens"), 4096)
    val pkPlan = pk.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(pkPlan).size == 1, pkPlan)
  }

  test("plan shape: batched ANN broadcasts queries and bounds rows before its shuffle") {
    val emb = graft.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val batch = Similarity.bruteForceTopKBatch(
      emb.filter(col("vec_id") >= 3), col("vec_id"), col("embedding"), queries, k = 5)
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("MapPartitions"), plan) // the bounded per-partition combiner
  }

  test("connected components merge chains and keep separate groups apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 3L)).toDF("id_a", "id_b")
    val cc = DupClusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L && cc(8L) == 1L) // chain via 2-3, 8-3
    assert(cc(5L) == 5L && cc(6L) == 5L)
    val surv = DupClusters.survivors(pairs)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    assert(surv == Set(1L, 5L))
  }

  test("connected components on a long path converge to one cluster") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = DupClusters.connectedComponents(chain)
      .collect().map(r => r.getLong(1)).toSet
    assert(cc == Set(1L)) // every vertex labeled by the path minimum
  }
}
