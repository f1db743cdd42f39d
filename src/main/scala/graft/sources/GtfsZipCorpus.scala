package graft.sources

import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import com.univocity.parsers.csv.{CsvParser, CsvParserSettings}

import graft.gtfs.{GtfsFeed, GtfsLake, GtfsSchemas}

/** Distributed loader for a corpus of zipped GTFS feeds — the scale
  * path for the reference's "load and merge several feeds" (a single
  * zip entry isn't splittable, but a fleet of feed zips parallelizes
  * per zip: each executor task opens its zips locally and streams
  * entries through a proper CSV parser).
  *
  * Row schema per table follows GtfsSchemas; a `feed_source` column
  * records the originating zip. Header projection matches the
  * reference loader (unknown columns dropped, missing columns null —
  * ddb.py:350-385).
  */
object GtfsZipCorpus {

  /** Parse one table out of the zips, distributed one-task-per-zip.
    * (Zip paths must be visible on executors — local FS here, an
    * object-store download in a real deployment.)
    */
  def readTable(spark: SparkSession, zipPaths: Seq[String], table: String): DataFrame = {
    val schema = GtfsSchemas.staticTables(table)
    val fieldNames = schema.fieldNames
    val rawSchema = StructType(
      fieldNames.map(f => StructField(f, StringType)) :+ StructField("feed_source", StringType))

    val rdd = spark.sparkContext
      .parallelize(zipPaths, math.max(1, zipPaths.size))
      .flatMap { zipPath =>
        val zf = new ZipFile(zipPath)
        val entry = zf.entries().asScala.find { e =>
          val base = java.nio.file.Paths.get(e.getName).getFileName.toString
          !e.isDirectory && base == s"$table.txt"
        }
        entry match {
          case None => zf.close(); Iterator.empty
          case Some(e) =>
            val settings = new CsvParserSettings
            settings.setMaxCharsPerColumn(1 << 20)
            settings.setMaxColumns(512)
            val parser = new CsvParser(settings)
            val lines = parser.iterate(zf.getInputStream(e), "UTF-8").iterator().asScala
            if (!lines.hasNext) { zf.close(); Iterator.empty }
            else {
              val header = lines.next().map(h => if (h == null) "" else h.trim)
              val idx: Map[String, Int] = header.zipWithIndex.toMap
              val positions = fieldNames.map(f => idx.getOrElse(f, -1))
              val it = lines.map { rec =>
                Row.fromSeq(positions.map { p =>
                  if (p < 0) null // column absent from this feed's header
                  // present column: python csv.reader semantics — an
                  // empty/short field is '', never NULL (csvddb.py:44-49)
                  else if (p >= rec.length || rec(p) == null) ""
                  else rec(p)
                }.toIndexedSeq :+ zipPath)
              }
              // defer close to iterator exhaustion
              new Iterator[Row] {
                def hasNext: Boolean = { val h = it.hasNext; if (!h) zf.close(); h }
                def next(): Row = it.next()
              }
            }
        }
      }

    val raw = spark.createDataFrame(rdd, rawSchema)
    GtfsLake.alignToSchema(raw,
      StructType(schema.fields :+ StructField("feed_source", StringType)))
  }

  /** Load + merge a corpus of feed zips into one GtfsFeed (append
    * semantics per table; run `dropSubset`-style upserts afterwards
    * for key-matched merging).
    */
  def loadStaticZips(spark: SparkSession, zipPaths: Seq[String]): GtfsFeed = {
    val tables = GtfsSchemas.staticTables.keys.map { t =>
      t -> readTable(spark, zipPaths, t).drop("feed_source")
    }.toMap
    GtfsFeed(spark, tables)
  }
}
