package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{DecisionStump, RecordLinkage}

/** Round-8 session-3 additions, part 2: probabilistic record linkage
  * (C113) and exact decision-stump split search (C114).
  */
object Round8dQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Linkage rules: name is the strong identifier; segment and
    * balance bucket are corroborating weak fields. Milli log-odds.
    */
  val LinkRules = Seq(
    RecordLinkage.FieldRule("name", 4000L, -500L),
    RecordLinkage.FieldRule("seg", 700L, -200L),
    RecordLinkage.FieldRule("bal_bucket", 900L, -300L))
  val LinkMatch = 3000L
  val LinkPossible = 600L

  /** The perturbed-twin fixture: every 5th name case-mangled, every
    * 3rd segment replaced — so true pairs split across match /
    * possible and coincidental same-block agreement lands in
    * possible.
    */
  private def linkSides(d: DataFrame): (DataFrame, DataFrame) = {
    val base = d.select(col("c_custkey"), col("c_nationkey"),
      col("c_name"), col("c_mktsegment"),
      floor(col("c_acctbal") / 100).cast("bigint").as("bal_bucket"))
    val left = base.select(col("c_custkey").as("rid"),
      col("c_nationkey").as("block"), col("c_name").as("name"),
      col("c_mktsegment").as("seg"), col("bal_bucket"))
    val right = base.select(
      (col("c_custkey") + 10000000L).as("rid"),
      col("c_nationkey").as("block"),
      when(col("c_custkey") % 5 === 0, upper(col("c_name")))
        .otherwise(col("c_name")).as("name"),
      when(col("c_custkey") % 3 === 0, lit("ALTERED"))
        .otherwise(col("c_mktsegment")).as("seg"),
      col("bal_bucket"))
    (left, right)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C113: Fellegi-Sunter linkage of customer against its perturbed
    // twin — blocked by nation, integer milli-log-odds evidence.
    "q_record_linkage" -> { (s, dir) =>
      val (l, r) = linkSides(t(s, dir, "customer"))
      RecordLinkage.score(l, r, LinkRules, LinkMatch, LinkPossible)
        .orderBy(col("id_a"), col("id_b"))
    },

    // C114: optimal single-threshold split of floor(value) against
    // the purchase label — full exact-Gini split curve, rk=1 optimal.
    "q_stump" -> { (s, dir) =>
      DecisionStump.splitScores(t(s, dir, "events"),
          floor(col("value")), col("event_type") === "purchase")
        .orderBy(col("threshold"))
    }
  )

  val oracles: Map[String, String] = Map(

    "q_record_linkage" -> {
      val baseSql =
        """SELECT c_custkey, c_nationkey, c_name, c_mktsegment,
          |  CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket FROM customer"""
          .stripMargin
      val leftSql =
        s"""SELECT c_custkey AS rid, c_nationkey AS block, c_name AS name,
           |  c_mktsegment AS seg, bal_bucket FROM ($baseSql)""".stripMargin
      val rightSql =
        s"""SELECT c_custkey + 10000000 AS rid, c_nationkey AS block,
           |  CASE WHEN c_custkey % 5 = 0 THEN upper(c_name) ELSE c_name END AS name,
           |  CASE WHEN c_custkey % 3 = 0 THEN 'ALTERED' ELSE c_mktsegment END AS seg,
           |  bal_bucket FROM ($baseSql)""".stripMargin
      RecordLinkage.scoreSql(leftSql, rightSql, LinkRules, LinkMatch, LinkPossible) +
        "\nORDER BY id_a, id_b"
    },

    "q_stump" ->
      """WITH s AS (SELECT CAST(floor(value) AS BIGINT) AS t,
        |             (event_type = 'purchase') AS y FROM events),
        |g AS (SELECT t,
        |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |        CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n
        |      FROM s GROUP BY t),
        |c AS (SELECT t, p, n,
        |        CAST(sum(p) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lp,
        |        CAST(sum(n) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lneg
        |      FROM g),
        |tt AS (SELECT CAST(sum(p) AS BIGINT) AS tot_p,
        |              CAST(sum(n) AS BIGINT) AS tot_n FROM g),
        |d AS (SELECT c.t, c.lp, c.lneg,
        |        tt.tot_p - c.lp AS rp, tt.tot_n - c.lneg AS rn,
        |        c.lp + c.lneg AS lt,
        |        (tt.tot_p - c.lp) + (tt.tot_n - c.lneg) AS rt
        |      FROM c, tt),
        |sc AS (SELECT t, lp, lneg, rp, rn,
        |         CAST((1000 * ((CAST(lt AS HUGEINT) * lt
        |             - CAST(lp AS HUGEINT) * lp
        |             - CAST(lneg AS HUGEINT) * lneg) * rt
        |           + (CAST(rt AS HUGEINT) * rt
        |             - CAST(rp AS HUGEINT) * rp
        |             - CAST(rn AS HUGEINT) * rn) * lt))
        |           // (CAST(lt AS HUGEINT) * rt) AS BIGINT) AS score_milli
        |       FROM d WHERE rt > 0)
        |SELECT t AS threshold, lp AS l_pos, lneg AS l_neg,
        |  rp AS r_pos, rn AS r_neg, score_milli,
        |  CAST(row_number() OVER (ORDER BY score_milli, t) AS BIGINT) AS rk
        |FROM sc ORDER BY threshold""".stripMargin
  )
}
