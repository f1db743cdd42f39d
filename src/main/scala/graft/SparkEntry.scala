package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §8 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.defs ++
      graft.queries.TextQueries.defs ++
      graft.queries.VectorQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.CorpusQueries.defs ++
      graft.queries.Round6Queries.defs ++
      graft.queries.Round7Queries.defs ++
      graft.queries.Round7bQueries.defs ++
      graft.queries.Round7cQueries.defs ++
      graft.queries.Round7dQueries.defs ++
      graft.queries.Round8Queries.defs ++
      graft.queries.Round8bQueries.defs ++
      graft.queries.Round8cQueries.defs ++
      graft.queries.Round8dQueries.defs ++
      graft.queries.Round8eQueries.defs ++
      graft.queries.Round8fQueries.defs ++
      graft.queries.Round8gQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.VectorQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.CorpusQueries.oracles ++
      graft.queries.Round6Queries.oracles ++
      graft.queries.Round7Queries.oracles ++
      graft.queries.Round7bQueries.oracles ++
      graft.queries.Round7cQueries.oracles ++
      graft.queries.Round7dQueries.oracles ++
      graft.queries.Round8Queries.oracles ++
      graft.queries.Round8bQueries.oracles ++
      graft.queries.Round8cQueries.oracles ++
      graft.queries.Round8dQueries.oracles ++
      graft.queries.Round8eQueries.oracles ++
      graft.queries.Round8fQueries.oracles ++
      graft.queries.Round8gQueries.oracles
}
