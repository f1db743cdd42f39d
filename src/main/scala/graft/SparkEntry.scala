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
      graft.queries.DedupQueries.defs ++
      graft.queries.CurationQueries.defs ++
      graft.queries.TextKernelQueries.defs ++
      graft.queries.AnnQueries.defs ++
      graft.queries.ClassifierQueries.defs ++
      graft.queries.EvalQueries.defs ++
      graft.queries.GraphQueries.defs ++
      graft.queries.LinkageQueries.defs ++
      graft.queries.AuditQueries.defs ++
      graft.queries.RelationalQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.VectorQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.CorpusQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.CurationQueries.oracles ++
      graft.queries.TextKernelQueries.oracles ++
      graft.queries.AnnQueries.oracles ++
      graft.queries.ClassifierQueries.oracles ++
      graft.queries.EvalQueries.oracles ++
      graft.queries.GraphQueries.oracles ++
      graft.queries.LinkageQueries.oracles ++
      graft.queries.AuditQueries.oracles ++
      graft.queries.RelationalQueries.oracles
}
