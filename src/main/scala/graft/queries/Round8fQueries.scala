package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{ClusterAgreement, CorpusStats}

/** Round-8 session-3 additions, part 4: PSI score-drift monitor
  * (C119) and exact Adjusted Rand clustering agreement (C120).
  */
object Round8fQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** PSI bin width over floor(value). */
  val PsiBinWidth = 50L

  /** ARI perturbation: every 10th doc reassigned to a fresh cell. */
  val AriMod = 10L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C119: has the purchase population's value distribution shifted
    // vs views — per-bin PSI contributions in exact micro-nats.
    "q_psi" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      def side(tpe: String) = ev.filter(col("event_type") === tpe)
        .select(expr(s"CAST(floor(value) AS BIGINT) DIV $PsiBinWidth").as("bin"))
      CorpusStats.psi(side("view"), side("purchase")).orderBy(col("bin"))
    },

    // C120: ARI of the language partition against a 10%-perturbed
    // copy — high-but-not-perfect agreement, exactly quantified.
    "q_ari" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val pa = d.select(col("doc_id").as("id"), col("lang").as("cell"))
      val pb = d.select(col("doc_id").as("id"),
        when(col("doc_id") % AriMod === 0, lit("xx"))
          .otherwise(col("lang")).as("cell"))
      ClusterAgreement.ariMilli(pa, pb)
    }
  )

  val oracles: Map[String, String] = Map(

    "q_psi" ->
      s"""WITH refb AS (SELECT CAST(floor(value) AS BIGINT) // $PsiBinWidth AS bin
         |              FROM events WHERE event_type = 'view'),
         |curb AS (SELECT CAST(floor(value) AS BIGINT) // $PsiBinWidth AS bin
         |         FROM events WHERE event_type = 'purchase'),
         |${CorpusStats.psiSqlTail}""".stripMargin,

    "q_ari" ->
      s"""WITH pa AS (SELECT doc_id AS id, lang AS cell FROM documents),
         |pb AS (SELECT doc_id AS id,
         |         CASE WHEN doc_id % $AriMod = 0 THEN 'xx' ELSE lang END AS cell
         |       FROM documents),
         |${ClusterAgreement.ariSqlTail}""".stripMargin
  )
}
