package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching (entity resolution / near-key join).
  *
  * Never an all-pairs comparison: candidate pairs come from an
  * EQUI-join on a caller-supplied blocking key (token key, phonetic
  * code, sorted-neighborhood key, ...), so the shuffle is keyed and
  * the plan is a plain hash/sort-merge join — at 100 TB the cost is
  * O(sum of block sizes squared), never O(n²) overall, and the
  * blocking column is the only thing that moves in the shuffle
  * beyond the strings themselves.
  *
  * Two guards keep the per-pair verify cheap:
  *   - the length-difference lower bound (|len(a)−len(b)| ≤ d is
  *     necessary for edit distance ≤ d) filters before any distance
  *     computation runs;
  *   - the distance uses Spark's bounded `levenshtein(a, b, d)`
  *     (banded DP that abandons a pair once the running distance
  *     exceeds d: O(d·n) per pair, not O(n²)).
  *
  * Part of the training-data-pipeline surface (SURVEY §2 C29); the
  * reference engine has no fuzzy matching.
  */
object FuzzyJoin {

  /** All within-block pairs (id_a < id_b) at edit distance ≤ maxDist.
    * Returns (id_a, id_b, str_a, str_b, dist).
    */
  def selfJoin(df: DataFrame, id: Column, str: Column, block: Column,
      maxDist: Int): DataFrame = {
    val a = df.select(id.as("id_a"), str.as("str_a"), block.as("blk"))
    val b = df.select(id.as("id_b"), str.as("str_b"), block.as("blk"))
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("str_a")) - length(col("str_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0) // bounded levenshtein returns -1 past the bound
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"),
        col("dist").cast("bigint").as("dist"))
  }

  /** Left-to-right variant: for each left row, the right rows in the
    * same block within maxDist. Returns left id/str, right id/str, dist.
    */
  def join(left: DataFrame, leftId: Column, leftStr: Column, leftBlock: Column,
      right: DataFrame, rightId: Column, rightStr: Column, rightBlock: Column,
      maxDist: Int): DataFrame = {
    val a = left.select(leftId.as("id_a"), leftStr.as("str_a"), leftBlock.as("blk"))
    val b = right.select(rightId.as("id_b"), rightStr.as("str_b"), rightBlock.as("blk"))
    a.join(b, "blk")
      .filter(abs(length(col("str_a")) - length(col("str_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"),
        col("dist").cast("bigint").as("dist"))
  }
}
