package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI wiring for the differential parameter fuzz (FuzzVerify): 26
  * seeded random parameterizations across 11 op families (r13 added
  * winnowing k/w/df, PCA iters, Luhn length-window) are dumped
  * at sf0.01 and compared against their DuckDB twins by
  * scripts/selfcheck.py — the committed-constants-only parity trap.
  */
class FuzzOracleSpec extends AnyFunSuite with SparkTestBase {

  test("26 seeded param configs are Spark==DuckDB at sf0.01") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists, "driver testdata")
    val script = new java.io.File("scripts/selfcheck.py")
    assume(script.exists, "run from the repo root")
    val out = java.nio.file.Files.createTempDirectory("fuzz_out").toString

    val buildFailures = FuzzVerify.run(spark, sfDir, out, seed = 12L, n = 26)
    assert(buildFailures.isEmpty, s"configs failed to build: $buildFailures")

    val pb = new ProcessBuilder("/usr/bin/env", "python3", script.getPath, sfDir, out)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val code = p.waitFor()
    assume(!log.contains("No such file or directory"), "python3 unavailable")
    assert(code == 0, s"selfcheck failed (exit $code):\n$log")
    assert(log.contains("26 pass, 0 fail"), log.linesIterator.toSeq.takeRight(6).mkString("\n"))
  }
}
