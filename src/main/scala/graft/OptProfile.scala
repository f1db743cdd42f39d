package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round measurement harness (guide §1): for each named
  * query, dump `.explain("formatted")` to `plans/<tag>/<q>_<suffix>.txt`
  * and time N passes under a job/stage/task-counting listener, so a
  * change's effect shows up as "jobs 14 → 6, tasks 412 → 180" and not
  * just noisy wall seconds. Timing methodology matches graft.Bench
  * (same warmup, same `.count()` action, min of passes).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_PROFILE_SUFFIX=before \
  *   sbt "runMain graft.OptProfile q_label_prop q_kcore"
  */
object OptProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PROFILE_SUFFIX", "before")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PROFILE_OUT", "plans/r14")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate(s"local[$cpus]", cpus)

    // same warmup as graft.Bench (read-only by default; persist base
    // tables only behind the same flag) so per-query numbers are
    // comparable to the bench's
    val warmTables = sys.env.get("SPARK_GRAFT_BENCH_WARM_TABLES").exists(_ == "1")
    Tables.all.foreach { t =>
      val df = Tables.read(spark, sfDir, t)
      (if (warmTables) df.persist() else df).count()
    }
    Tables.registerViews(spark, sfDir)
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    // same cache discipline as graft.Bench: cold by default (clear
    // shared handles after every timed pass), shared behind the flag
    val sharedCache =
      sys.env.get("SPARK_GRAFT_BENCH_SHARED_CACHE").exists(_ == "1")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    def snap(): (Int, Int, Int) = (jobs.get, stages.get, tasks.get)

    Files.createDirectories(Paths.get(outDir))
    println(f"${"query"}%-26s ${"pass_secs"}%-24s jobs1 stages1 tasks1 jobsWarm")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      spark.sparkContext.setJobDescription(s"$name [$suffix]")
      val times = (1 to math.max(1, passes)).map { p =>
        val (j0, s0, t0c) = snap()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val (j1, s1, t1c) = snap()
        if (!sharedCache) graft.util.PlanCache.clear(spark)
        (dt, j1 - j0, s1 - s0, t1c - t0c)
      }
      spark.sparkContext.setJobDescription(null)
      val secs = times.map(t => f"${t._1}%.3f").mkString(",")
      val (_, j1, s1, k1) = times.head
      val jWarm = times.last._2
      println(f"$name%-26s $secs%-24s $j1%5d $s1%7d $k1%6d $jWarm%8d")
    }
    try { graft.util.PlanCache.clear(spark); spark.stop() } catch { case _: Throwable => () }
  }
}
