package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.gtfs.{GtfsFeed, GtfsFixture}

class GtfsZipCorpusSpec extends AnyFunSuite with SparkTestBase {

  private def makeZip(suffix: String): String = {
    val dir = GtfsFixture.writeTo()
    val feed = GtfsFeed.loadStatic(spark, dir.toString)
    val zipPath = dir.resolve(s"feed$suffix.zip").toString
    feed.exportStatic(zipPath)
    zipPath
  }

  test("distributed multi-zip corpus load unions all feeds with source tracking") {
    val zips = Seq(makeZip("A"), makeZip("B"), makeZip("C"))

    val trips = GtfsZipCorpus.readTable(spark, zips, "trips")
    assert(trips.count() == 12) // 4 trips x 3 feeds
    assert(trips.select("feed_source").distinct().count() == 3)
    assert(trips.schema("route_id").dataType.typeName == "string")

    val corpus = GtfsZipCorpus.loadStaticZips(spark, zips)
    assert(corpus.table("stops").count() == 18)
    assert(corpus.table("stop_times").count() == 27)
    // schema-aligned: typed columns survive the distributed parse
    assert(corpus.table("stop_times").schema("stop_sequence").dataType.typeName == "integer")
    assert(corpus.table("stop_times")
      .filter(col("trip_id") === "t1" && col("stop_sequence") === 2)
      .select("stop_id").distinct().first().getString(0) == "s2")
  }

  test("registered SQL functions expose the native kernels") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), "the quick brown fox jumps"))
      .toDF("a", "b", "text").createOrReplaceTempView("fn_test")
    val r = spark.sql(
      """SELECT graft_cosine(a, b) AS c, graft_simhash(text) AS s,
        |       size(graft_shingles(text, 3)) AS n FROM fn_test""".stripMargin).first()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 3)

    val r2 = spark.sql(
      """SELECT graft_repetition_stats(text).n_tokens AS nt,
        |       graft_repetition_stats('a a b').max_bigram_count AS mb,
        |       graft_wordpiece_count('unaffable', array('un', '##aff', '##able')) AS wp,
        |       graft_wordpiece_tokens('unaffable', array('un', '##aff', '##able'))[0] AS w0
        |FROM fn_test""".stripMargin).first()
    assert(r2.getLong(0) == 5L)
    assert(r2.getLong(1) == 1L) // bigrams of "a a b": [a a, a b] -> max 1
    assert(r2.getLong(2) == 3L)
    assert(r2.getString(3) == "un")
  }
}
