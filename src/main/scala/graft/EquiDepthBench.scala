package graft

import org.apache.spark.sql.functions._

import graft.ops.EquiDepth

/** Micro-bench behind [[graft.ops.EquiDepth.AutoDistinctCutoff]]: times
  * the single-window vs partitioned-prefix-sum cumulative strategies
  * across distinct-value scales on one table (docs/EQUIDEPTH.md holds
  * the recorded numbers). Value expressions are chosen to sweep the
  * distinct count while scanning the SAME rows: a price column
  * (~1M distinct at sf10), the order key (15M), and a per-row
  * synthetic key (60M) — so the delta between strategies is the
  * cumulative pass, not the scan.
  *
  * Usage: runMain graft.EquiDepthBench <parquetDir> (a dir holding
  * lineitem.parquet; defaults to /tmp/sf10).
  */
object EquiDepthBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = GraftSession.getOrCreate("local[32]", 32)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"rows=${li.count()}")

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"MEASURE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val cases = Seq(
      ("price", col("l_extendedprice").cast("bigint")),
      ("pkey", col("l_partkey")),
      ("okey4", col("l_orderkey") / lit(4L)),
      ("okey", col("l_orderkey")),
      ("rowid", col("l_orderkey") * lit(10L) + col("l_linenumber")))
    // optional second arg: comma-separated case filter for re-runs
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    for ((tag, c) <- cases if only.forall(_.contains(tag))) {
      val nd = li.select(c.cast("bigint").as("v"))
        .filter(col("v").isNotNull).distinct().count()
      println(s"DISTINCT $tag $nd")
      // two passes each; read the SECOND (steady-state, caches warm)
      for (pass <- 1 to 2) {
        time(s"$tag single p$pass") { EquiDepth.histogram(li, c, 100).count() }
        time(s"$tag partitioned p$pass") {
          EquiDepth.histogramPartitioned(li, c, 100).count()
        }
      }
    }
    spark.stop()
  }
}
