package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi-Sunter style) — the entity-
  * resolution scorer behind "are these two records the same customer
  * / stop / document source": blocked candidate pairs scored by
  * per-field agreement log-odds weights, classified match / possible
  * / non-match by thresholds. The fuzzy-join family (A34) finds
  * string-close pairs; linkage DECIDES, combining evidence across
  * heterogeneous fields with field-specific reliabilities.
  *
  * Determinism: weights are integer milli-log-odds, agreement is
  * null-safe equality, the score is an integer sum — bit-exact on
  * any engine. (Real deployments estimate the m/u probabilities with
  * EM; the weights here are caller-supplied, which keeps the scorer
  * exact and the estimation step separable.)
  *
  * Scale shape: candidate generation is a blocked equi-join (the
  * C104/C2 lesson: never all-pairs) — fixed-width rows once the
  * compared fields are projected; a hot block is the C13 salting
  * case. The emitted pair set is bounded by the `tPossible` filter,
  * not the block cross product.
  */
object RecordLinkage {

  /** One comparison rule: agreement on `field` adds `wAgree`,
    * disagreement (incl. either side null) adds `wDisagree`
    * (typically negative) — both in milli units.
    */
  final case class FieldRule(field: String, wAgree: Long, wDisagree: Long)

  /** Score blocked candidate pairs between `left` and `right`.
    *
    * Both inputs must carry: an id column `rid` (bigint, unique
    * across BOTH sides), a blocking column `block`, and every
    * rule field.
    *
    * @return (id_a, id_b, agree_mask, score_milli, cls) for pairs
    *         with score >= tPossible; agree_mask bit i = rule i
    *         agreed; cls in {match, possible}
    */
  def score(
      left: DataFrame,
      right: DataFrame,
      rules: Seq[FieldRule],
      tMatch: Long,
      tPossible: Long): DataFrame = {
    require(rules.nonEmpty && rules.size <= 62, "1..62 rules")
    require(tMatch >= tPossible, "tMatch >= tPossible")
    val l = left.select(col("rid").cast("bigint").as("id_a") +:
      col("block").as("block") +:
      rules.map(r => col(r.field).as(s"a_${r.field}")): _*)
    val r = right.select(col("rid").cast("bigint").as("id_b") +:
      col("block").as("block") +:
      rules.map(r => col(r.field).as(s"b_${r.field}")): _*)

    val agreeBits = rules.zipWithIndex.map { case (rule, i) =>
      when(col(s"a_${rule.field}") <=> col(s"b_${rule.field}"),
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val scoreSum = rules.map { rule =>
      when(col(s"a_${rule.field}") <=> col(s"b_${rule.field}"),
        lit(rule.wAgree)).otherwise(lit(rule.wDisagree))
    }.reduce(_ + _)

    l.join(r, "block")
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("agree_mask", agreeBits)
      .withColumn("score_milli", scoreSum)
      .filter(col("score_milli") >= tPossible)
      .withColumn("cls",
        when(col("score_milli") >= tMatch, lit("match")).otherwise(lit("possible")))
      .select(col("id_a"), col("id_b"), col("agree_mask"),
        col("score_milli"), col("cls"))
  }

  /** DuckDB twin of [[score]]: same blocked join + CASE sums over
    * `leftSql`/`rightSql` relations exposing rid/block/fields.
    */
  def scoreSql(
      leftSql: String,
      rightSql: String,
      rules: Seq[FieldRule],
      tMatch: Long,
      tPossible: Long): String = {
    val mask = rules.zipWithIndex.map { case (rule, i) =>
      s"CASE WHEN a.${rule.field} IS NOT DISTINCT FROM b.${rule.field} " +
        s"THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    val sum = rules.map { rule =>
      s"CASE WHEN a.${rule.field} IS NOT DISTINCT FROM b.${rule.field} " +
        s"THEN ${rule.wAgree} ELSE ${rule.wDisagree} END"
    }.mkString(" + ")
    s"""WITH la AS ($leftSql), rb AS ($rightSql),
       |scored AS (
       |  SELECT a.rid AS id_a, b.rid AS id_b,
       |         CAST($mask AS BIGINT) AS agree_mask,
       |         CAST($sum AS BIGINT) AS score_milli
       |  FROM la a JOIN rb b ON a.block = b.block AND a.rid <> b.rid)
       |SELECT id_a, id_b, agree_mask, score_milli,
       |  CASE WHEN score_milli >= $tMatch THEN 'match' ELSE 'possible' END AS cls
       |FROM scored WHERE score_milli >= $tPossible""".stripMargin
  }
}
