package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic weighted source interleaving — the global TRAINING
  * ORDER of a mixed corpus: a source with weight w contributes one
  * document every 1/w "virtual time" units, so heavier sources
  * appear proportionally more often and every prefix of the order
  * respects the mixture (the property loaders rely on when a run
  * stops early). Complements C38's temperature sampling (which picks
  * WHAT to include; this orders it).
  *
  * Scale shape: per-source ranks come from source-partitioned
  * windows (bounded by source size, hash-ordered → deterministic);
  * the virtual-time key is pure integer arithmetic (`rank * SCALE
  * DIV weight`), so the global order is a distributed ORDER BY on
  * (vkey, source, rank) — a range-partitioned sort, never a global
  * row_number. Write with `repartitionByRange(vkey)` +
  * `sortWithinPartitions` for an ordered shard layout (A35's
  * pattern).
  */
object Mixing {

  private final val Scale = 1000000L

  /** Interleave rows by weighted virtual time:
    * (source, doc_id, src_rank, vkey) where vkey = src_rank · SCALE
    * DIV weight(source). `weights` maps source → positive integer
    * weight; missing sources default to weight 1.
    */
  def interleave(df: DataFrame, source: Column, key: Column,
      weights: Map[String, Int]): DataFrame = {
    require(weights.values.forall(_ >= 1), "weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.toDF("source", "w"))

    val ranked = df
      .select(source.cast("string").as("source"), key.cast("bigint").as("doc_id"))
      .withColumn("src_rank",
        row_number().over(Window.partitionBy(col("source"))
          .orderBy(Dedup.md5Hash60(col("doc_id").cast("string")), col("doc_id")))
          .cast("bigint"))

    ranked
      .join(wdf, Seq("source"), "left")
      .select(col("source"), col("doc_id"), col("src_rank"),
        expr(s"(src_rank * $Scale) DIV coalesce(w, 1)").as("vkey"))
  }

  /** DuckDB twin of [[interleave]] over `table(sourceExpr, keyExpr)`;
    * `weightsSql` is a VALUES relation `(source, w)`. Final relation
    * `mixed`.
    */
  def interleaveSql(table: String, sourceExpr: String, keyExpr: String,
      weightsSql: String): String =
    s"""mranked AS (
       |  SELECT CAST($sourceExpr AS VARCHAR) AS source, CAST($keyExpr AS BIGINT) AS doc_id,
       |    CAST(row_number() OVER (PARTITION BY $sourceExpr
       |      -- hash the BIGINT-cast key's rendering, mirroring the Spark
       |      -- side's doc_id.cast(bigint).cast(string): a non-canonical
       |      -- numeric key ('007', 7.0) must hash identically in both
       |      ORDER BY ('0x' || substr(md5(CAST(CAST($keyExpr AS BIGINT) AS VARCHAR)), 1, 15))::BIGINT,
       |        CAST($keyExpr AS BIGINT)) AS BIGINT) AS src_rank
       |  FROM $table),
       |mweights AS ($weightsSql),
       |mixed AS (
       |  SELECT r.source, r.doc_id, r.src_rank,
       |    (r.src_rank * $Scale) // coalesce(w.w, 1) AS vkey
       |  FROM mranked r LEFT JOIN mweights w ON r.source = w.source)""".stripMargin
}
