package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, IntervalUnion, SpatialJoin}

/** General relational-operator queries: grid-blocked spatial radius
  * self-join (A50), per-key interval-union coverage (A51),
  * unpivot/melt (A45), and the bounded per-group top-k aggregate
  * (C66).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Spatial join: synthetic planar field side + radius. */
  val FieldSide = 1000000L
  val Radius = 5000L

  /** Interval length: floor(value) x 10 minutes in microseconds. */
  val IvUnitUs = 600000000L

  /** Per-group heap depth for q_group_topk. */
  val GroupTopK = 5

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A50: stop-proximity style radius self-join on a synthetic
    // integer planar field (deterministic per-customer coordinates);
    // the grid-blocked plan must equal the oracle's brute force.
    "q_spatial_join" -> { (s, dir) =>
      val pts = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        (Dedup.md5Hash60(concat(lit("px:"), col("c_custkey").cast("string")))
          % FieldSide).as("x"),
        (Dedup.md5Hash60(concat(lit("py:"), col("c_custkey").cast("string")))
          % FieldSide).as("y"))
      SpatialJoin.radiusSelfJoin(pts, Radius).orderBy(col("id_a"), col("id_b"))
    },

    // A51: per-user activity coverage — events carry a floor(value)
    // x 10 min activity interval; overlaps merge into islands. The
    // duration is clamped at zero so a (hypothetical) negative value
    // yields an empty interval rather than an inverted s > e one —
    // unionStats documents but does not enforce s <= e.
    "q_interval_union" -> { (s, dir) =>
      val u = unix_micros(col("ts"))
      val iv = t(s, dir, "events").select(col("user_id").as("key"),
        u.as("s"),
        (u + expr(s"greatest(CAST(floor(value) AS BIGINT), 0) * $IvUnitUs")).as("e"))
      IntervalUnion.unionStats(iv, col("key"), col("s"), col("e"))
        .orderBy(col("key"))
    },

    // A45: unpivot / melt — wide measure columns to long
    // (measure, value) rows, the inverse of A28's pivot.
    "q_unpivot" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          col("p_size").cast("double").as("p_size"),
          col("p_retailprice").cast("double").as("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "measure", "value")
        .orderBy(col("p_partkey"), col("measure"))
    },

    // C66: per-group bounded top-k — heap aggregate, shuffle carries
    // ≤ k pairs per (task, group) instead of every row to a window.
    "q_group_topk" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(graft.plans.TopKAgg.topK(col("n_chars"), col("doc_id"), GroupTopK).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("bigint").as("rank"),
          col("col.id").as("doc_id"), col("col.score").as("n_chars"))
        .orderBy(col("lang"), col("rank"))
    }
  )

  private val h60: String => String =
    v => s"('0x' || substr(md5(CAST($v AS VARCHAR)), 1, 15))::BIGINT"

  val oracles: Map[String, String] = Map(

    "q_spatial_join" -> {
      val px = h60("'px:' || CAST(c_custkey AS VARCHAR)")
      val py = h60("'py:' || CAST(c_custkey AS VARCHAR)")
      s"""WITH p AS (SELECT c_custkey AS id,
         |             $px % $FieldSide AS x, $py % $FieldSide AS y
         |           FROM customer)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
         |    AS dist2,
         |  round(sqrt(CAST((a.x - b.x) * (a.x - b.x)
         |    + (a.y - b.y) * (a.y - b.y) AS DOUBLE)), 4) AS dist
         |FROM p a JOIN p b ON a.id < b.id
         |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         |  <= ${Radius * Radius}
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q_interval_union" ->
      s"""WITH iv AS (SELECT user_id AS key,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS s,
         |    epoch_us(CAST(ts AS TIMESTAMP))
         |      + greatest(CAST(floor(value) AS BIGINT), 0) * $IvUnitUs AS e
         |  FROM events),
         |${IntervalUnion.unionStatsSqlTail}
         |ORDER BY key""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS value FROM part
        |ORDER BY p_partkey, measure""".stripMargin,

    "q_group_topk" ->
      s"""SELECT lang, rank, doc_id, n_chars FROM (
         |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank
         |  FROM documents) t
         |WHERE rank <= $GroupTopK ORDER BY lang, rank""".stripMargin
  )
}
