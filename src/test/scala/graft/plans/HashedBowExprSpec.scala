package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.{Dedup, Features}

class HashedBowExprSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // the explode+groupBy composition the kernel replaces — the oracle
  private def composedBow(df: DataFrame, dim: Int): DataFrame =
    df.select(col("doc_id").cast("bigint").as("doc_id"),
        explode(filter(split(trim(lower(col("text"))), "\\s+"),
          t => length(t) > 0)).as("tok"))
      .select(col("doc_id"), (Dedup.md5Hash60(col("tok")) % dim).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  private def assertParity(df: DataFrame, dim: Int): Unit = {
    val a = composedBow(df, dim)
    val b = Features.hashedBow(df, col("doc_id"), col("text"), dim)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"hashedBow kernel differs from composition at dim=$dim")
  }

  test("kernel == explode+groupBy composition on the real corpus (dims 1, 64, 4096)") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    for (dim <- Seq(1, 64, 4096)) assertParity(docs, dim)
    assert(Features.hashedBow(docs, col("doc_id"), col("text"), 64).count() > 0)
  }

  test("edge cases: empty, whitespace-only, token-less docs vanish; repeats count") {
    val edge = Seq(
      (1L, "alpha beta alpha ALPHA"), // casefold collapses, counts accumulate
      (2L, ""), (3L, "   "), (4L, "\t\t"),
      (5L, "solo"), (6L, "x " * 1000)).toDF("doc_id", "text")
    for (dim <- Seq(1, 7, 64)) assertParity(edge, dim)
    // token-less docs produce NO rows (same as the explode shape)
    val ids = Features.hashedBow(edge, col("doc_id"), col("text"), 64)
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 5L, 6L))
    // doc 1: "alpha" x3 and "beta" x1 under dim big enough to separate
    val d1 = Features.hashedBow(edge.filter(col("doc_id") === 1L),
        col("doc_id"), col("text"), 4096)
      .select(col("cnt")).collect().map(_.getLong(0)).sorted.toSeq
    assert(d1 == Seq(1L, 3L))
  }

  test("hashedBowVec matches its pre-kernel composition, including absent token-less docs") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).limit(500)
      .unionByName(Seq((999999999L, "  ")).toDF("doc_id", "text"))
    val dim = 32
    val viaKernel = Features.hashedBowVec(docs, col("doc_id"), col("text"), dim)
    val viaComposition = composedBow(docs, dim)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("cnt")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i.cast("bigint")), lit(0L))).as("fvec"))
    assert(viaKernel.exceptAll(viaComposition).count() == 0 &&
      viaComposition.exceptAll(viaKernel).count() == 0)
    assert(viaKernel.filter(col("doc_id") === 999999999L).count() == 0)
  }

  test("dense-cap fallback path (dim > 65536) agrees with the dense path semantics") {
    val df = Seq((1L, "a b c a b a")).toDF("doc_id", "text")
    val big = Features.hashedBow(df, col("doc_id"), col("text"), (1 << 16) + 3)
      .orderBy(col("bucket")).collect().map(r => (r.getLong(1), r.getLong(2)))
    // 3 distinct tokens with counts 3/2/1, buckets ascending
    assert(big.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(big.map(_._1).toSeq == big.map(_._1).sorted.toSeq)
    assertParity(df, (1 << 16) + 3)
  }
}
