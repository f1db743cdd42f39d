package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked radius self-join over planar points — the spatial
  * proximity primitive a GTFS deployment asks for constantly ("which
  * stops are within r meters of each other" feeds stop merging,
  * transfer generation, and duplicate-stop audits; the reference's
  * stops.txt carries exactly these coordinates).
  *
  * Coordinates are INTEGER (fixed-point projected units — for
  * real lat/lon, scale an equirectangular projection to int
  * centimeters first); the match predicate is exact squared
  * Euclidean distance, so no trig and no float comparison crosses
  * the engine boundary.
  *
  * Scale shape: the classic epsilon-grid. Cell side = radius; each
  * point lands in exactly one cell; the LEFT side replicates to its
  * 3x3 cell neighborhood (a fixed 9x explode of fixed-width rows)
  * and equi-joins the RIGHT side's single home cell — a plain
  * shuffled hash join on the cell key, never a cross product, and
  * every qualifying pair is produced exactly once because the right
  * point's home cell is unique. Dense-city cell skew is the salting
  * case (C13); the 9x factor is constant, independent of n. The
  * output pair count is the true spatial answer, not a blowup.
  */
object SpatialJoin {

  /** All pairs (id_a < id_b) within `radius` (inclusive, Euclidean).
    *
    * @param points (id, x, y) integer coordinates
    * @return (id_a, id_b, dist2, dist) with dist = sqrt(dist2)
    *         rounded 4dp (sqrt of an integer — correctly rounded
    *         IEEE, engine-portable)
    */
  def radiusSelfJoin(points: DataFrame, radius: Long): DataFrame = {
    require(radius >= 1, "radius >= 1")
    val p = points.select(col("id").cast("bigint").as("id"),
      col("x").cast("bigint").as("x"), col("y").cast("bigint").as("y"))

    val offsets = Seq(-1L, 0L, 1L)
    val probe = p
      .withColumn("doff", explode(lit(offsets.flatMap(dx =>
        offsets.map(dy => dx * 3 + dy + 4)).toArray))) // 0..8 encoded
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (expr(s"x DIV ${radius}L") + expr("doff DIV 3") - 1L).as("cx"),
        (expr(s"y DIV ${radius}L") + col("doff") % 3 - 1L).as("cy"))
    val home = p.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
      expr(s"x DIV ${radius}L").as("cx"), expr(s"y DIV ${radius}L").as("cy"))

    probe.join(home, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= radius * radius)
      .select(col("id_a"), col("id_b"), col("dist2"),
        round(sqrt(col("dist2").cast("double")), 4).as("dist"))
  }
}
