package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (local iteration);
    // the driver always calls with exactly (sfDir, outDir) = everything
    val (sfDir, outDir) = (args(0), args(1))
    val only = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.getOrCreate(s"local[$cpus]", cpus)
    new java.io.File(outDir).mkdirs()
    // Bounded cache residency: ~180 queries' shared fixtures in one
    // 8 GB JVM sit near the heap line (a q_kcore pass OOM'd once in
    // r13 with everything resident) — dropping every PlanCache handle
    // each N queries caps the live set at one window's fixtures. The
    // window is wide enough that fixture-sharing query FAMILIES
    // (alphabetically adjacent: ann/bitext, bpe, dup/dedup) still
    // share their builds; correctness never depends on the cache.
    val clearEvery =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_CLEAR_EVERY", "48").toInt
    var sinceClear = 0
    SparkEntry.queries.toSeq.sortBy(_._1) // name order = family adjacency
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        sinceClear += 1
        if (clearEvery > 0 && sinceClear >= clearEvery) {
          graft.util.PlanCache.clear(spark)
          sinceClear = 0
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.util.PlanCache.clear(spark)
    spark.stop()
  }
}
