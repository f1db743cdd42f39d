package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** B10: streaming near-dup ingest against the durable LSH index. */
class IncrementalNearDupSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val textA =
    "the quick brown fox jumps over the lazy dog while rain falls on the quiet gray town tonight"
  private val textB =
    "colorless green ideas sleep furiously under a bright metal sky full of electric humming wires"
  private val textC =
    "seven silver ships sail slowly past the ancient stone harbor carrying salt wine and woven cloth"

  test("near-dups are rejected within a batch and against history; novel docs pass") {
    val tmp = java.nio.file.Files.createTempDirectory("neardup").toString
    val (sigDir, bandDir, accepted) = (s"$tmp/sig", s"$tmp/band", s"$tmp/accepted")

    def ingest(rows: (Long, String)*): Unit =
      IncrementalNearDup.ingestBatch(rows.toDF("doc_id", "text"),
        "doc_id", "text", sigDir, bandDir, accepted)

    // batch 1: A and B, unrelated → both accepted
    ingest(1L -> textA, 2L -> textB)
    // batch 2: a near-copy of A (one appended token), a novel doc C,
    // and a within-batch near-pair (11, 12) → 10 rejected vs history,
    // 12 rejected vs 11, C and 11 accepted
    ingest(
      10L -> (textA + " graftdup"),
      11L -> textC,
      12L -> (textC + " graftdup"))

    val got = spark.read.parquet(accepted).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 11L))

    // the stores grew by exactly the accepted docs
    val sigDocs = spark.read.parquet(sigDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(sigDocs == Set(1L, 2L, 11L))
    val bandRows = spark.read.parquet(bandDir).count()
    assert(bandRows == 3 * 4) // 3 docs × 4 bands
  }

  test("a doc appearing in a later batch with high overlap is caught by the stored index") {
    val tmp = java.nio.file.Files.createTempDirectory("neardup2").toString
    def ingest(rows: (Long, String)*): Unit =
      IncrementalNearDup.ingestBatch(rows.toDF("doc_id", "text"),
        "doc_id", "text", s"$tmp/sig", s"$tmp/band", s"$tmp/accepted")

    ingest(1L -> textA)
    ingest(2L -> textB)
    ingest(3L -> (textA + " extra")) // near-dup of a doc TWO batches back
    val got = spark.read.parquet(s"$tmp/accepted").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }
}
