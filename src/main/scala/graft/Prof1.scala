package graft
import org.apache.spark.sql.functions._
object Prof1 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]", 32)
    val emb = Tables.read(spark, "/tmp/sf1", "embeddings")
    emb.persist().count()
    val anchors = ops.SemanticDedup.anchors(64, 64)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("two-step cast then cell") {
      emb.select(col("vec_id").cast("bigint").as("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .select(col("vec_id"), col("v"),
          ops.SemanticDedup.cellOf(col("v"), anchors).as("cell"))
        .localCheckpoint(true)
    }
    time("argmax only ckpt (no v)") {
      emb.select(col("vec_id").cast("bigint").as("vec_id"),
        ops.SemanticDedup.cellOf(col("embedding"), anchors).as("cell"))
        .localCheckpoint(true)
    }
    val dotsOnly = array(anchors.map(a =>
      functions.VectorFunctions.dotProduct(col("v"), typedLit(a))): _*)
    time("dots array ckpt") {
      emb.select(col("embedding").cast("array<double>").as("v"))
        .select(dotsOnly.as("dots")).localCheckpoint(true)
    }
    spark.stop()
  }
}
