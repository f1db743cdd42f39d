package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Relational core of the engine: the generic operations the reference
  * implements imperatively on DuckDB, re-expressed as declarative
  * DataFrame transformations so Catalyst plans them (pushdown, join
  * strategy, AQE) and they scale out.
  *
  * Reference behaviors covered (see SURVEY.md §1):
  *  - remove-by-pattern (ddb.py:75-91)          -> [[removeWhere]]
  *  - cascading orphan removal (ddb.py:336-348) -> [[retainChildrenOf]] / [[GtfsFeed.removeDependentObjects]]
  *  - subset merge / upsert (strategy/match_stop_id.py) -> [[upsert]]
  *  - schema-aligned ingest (ddb.py:350-385)    -> [[alignToSchema]]
  *  - SQL passthrough (ddb.py:260-264)          -> [[sql]]
  */
object GtfsLake {

  /** Keep only rows NOT matching a SQL LIKE pattern on `column` —
    * the complement of the reference's `DELETE ... WHERE x LIKE ?`.
    * A plain filter: pushes down to the scan, no shuffle.
    */
  def removeWhere(df: DataFrame, column: Column, likePattern: String): DataFrame =
    df.filter(!column.like(likePattern) || column.isNull)

  /** Keep the child rows whose foreign key still has a parent —
    * one level of the reference's cascading cleanup
    * (`DELETE FROM child WHERE fk NOT IN (SELECT pk FROM parent)`,
    * inverted to the surviving set). left_semi carries only the key
    * column of the parent through the join; AQE broadcasts the parent
    * side when the surviving key set is small.
    */
  def retainChildrenOf(child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame = {
    // No distinct on the build side: semi/anti joins dedupe in the
    // build hash table for free — an explicit distinct is a whole
    // extra shuffle per cascade level.
    val keys = parent.select(col(pk).as("graft_pk"))
    child.join(keys, child(fk) === keys("graft_pk"), "left_semi")
  }

  /** Complement: the rows that would be cascade-deleted. */
  def orphansOf(child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame = {
    val keys = parent.select(col(pk).as("graft_pk"))
    child.join(keys, child(fk) === keys("graft_pk"), "left_anti")
  }

  /** MERGE semantics of the reference's subset "drop" (match_stop_id
    * strategy): rows present in `delta` update the matching base rows
    * column-by-column (null delta values keep the base value), rows
    * only in `delta` are inserted, rows only in `base` are kept.
    * One shuffle on the key via a full-outer join.
    */
  def upsert(base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val b = base.alias("graft_b")
    val d = delta.alias("graft_d")
    val cond = keys.map(k => col(s"graft_b.$k") <=> col(s"graft_d.$k")).reduce(_ && _)
    val outCols = base.columns.map { c =>
      if (delta.columns.contains(c)) coalesce(col(s"graft_d.$c"), col(s"graft_b.$c")).as(c)
      else col(s"graft_b.$c").as(c)
    }
    b.join(d, cond, "full_outer").select(outCols.toIndexedSeq: _*)
  }

  /** Project/cast/null-fill a frame onto a target schema — the
    * reference's CSV ingest keeps only columns the table declares and
    * leaves missing ones null (ddb.py:350-385). Pure projection:
    * column pruning reaches the scan, extra source columns are never
    * read.
    */
  def alignToSchema(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    val cols = target.fields.map { case StructField(name, dt, _, _) =>
      if (present.contains(name)) col(name).cast(dt).as(name)
      else lit(null).cast(dt).as(name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Restore duplicated CSV header columns: Spark's CSV reader
    * de-duplicates a repeated header by renaming every occurrence
    * with a positional ordinal (`route_short_name` twice becomes
    * `route_short_name1`, `route_short_name2`), so the schema-aligned
    * projection would null the column out entirely. Real feed zips DO
    * ship duplicate headers; apply the DictReader rule (the LAST
    * occurrence wins) by renaming the highest-ordinal variant back to
    * the base name — only when the base name itself is absent, so a
    * well-formed file is untouched.
    */
  def dedupHeadersLastWins(df: DataFrame, target: StructType): DataFrame = {
    val cols = df.columns
    val renames: Map[String, String] = target.fieldNames.toSet.flatMap { f: String =>
      if (cols.contains(f)) None
      else {
        val variants = cols.filter { c =>
          val suffix = c.stripPrefix(f)
          c.startsWith(f) && suffix.nonEmpty && suffix.forall(_.isDigit)
        }
        // Spark's dedup rename ALWAYS yields >= 2 ordinal variants (one
        // per occurrence of the duplicated header); a single suffixed
        // column is a legitimately-named field (e.g. a feed shipping
        // `route_short_name2` without the base column) and must NOT be
        // promoted onto the missing base name.
        if (variants.length < 2) None
        else Some(variants.maxBy(_.stripPrefix(f).toInt) -> f)
      }
    }.toMap
    if (renames.isEmpty) df
    else df.select(cols.map(c =>
      renames.get(c).map(n => col(c).as(n)).getOrElse(col(c))).toIndexedSeq: _*)
  }

  /** Coalesce every column of a raw all-string CSV frame to '' — the
    * reference's Python csv.reader never yields NULL for a column
    * present in the file (csvddb.py:36-49), while Spark's CSV reader
    * turns unquoted empty fields into NULL. Run this on the raw read,
    * BEFORE alignToSchema null-fills genuinely missing columns, so the
    * NULL/'' distinction downstream (e.g. the cascade's NOT IN
    * three-valued logic) matches the reference byte-for-byte.
    */
  def emptyNotNull(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => coalesce(col(c), lit("")).as(c)).toIndexedSeq: _*)

  /** Arbitrary SQL over registered views (ddb.py:260-264). */
  def sql(spark: SparkSession, statement: String): DataFrame =
    spark.sql(statement)

  /** Write a table bucketed (+ sorted) by its join key. Two tables
    * bucketed the same way join with ZERO exchanges — the 100 TB
    * co-location strategy for the fact⋈fact joins (trips⋈stop_times,
    * orders⋈lineitem): pay the shuffle once at write time, never at
    * query time.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(tableName)

  /** Write a fact table hive-partitioned by a derived column (date,
    * region, cell id): queries filtering on it prune whole partition
    * directories before any I/O — the other half of the 100 TB layout
    * story next to [[writeBucketed]].
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCol: String): Unit =
    df.write
      .format("parquet")
      .partitionBy(partitionCol)
      .mode("overwrite")
      .save(path)
}
