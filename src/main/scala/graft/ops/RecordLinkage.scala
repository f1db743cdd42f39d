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
    * disagreement adds `wDisagree` (typically negative) — both in
    * milli units. Comparison is null-safe equality (`<=>` / IS NOT
    * DISTINCT FROM): one side null counts as disagreement, BOTH
    * sides null counts as agreement (two records missing the same
    * field corroborate under the blocking assumption; spec-pinned in
    * the linkage suite). Pre-filter null-heavy fields out of the
    * rule set if missingness should not corroborate.
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

  /** Agreement-pattern histogram over ALL blocked candidate pairs
    * (no score threshold — estimation must see the disagreements):
    * (pattern, cnt) where pattern bit i = fields(i) agreed under
    * null-safe equality. At most 2^F rows regardless of data size —
    * the collapse that makes EM driver-cheap.
    */
  def agreementPatterns(left: DataFrame, right: DataFrame,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty && fields.size <= 16, "1..16 fields")
    val l = left.select(col("rid").cast("bigint").as("id_a") +:
      col("block").as("block") +:
      fields.map(f => col(f).as(s"a_$f")): _*)
    val r = right.select(col("rid").cast("bigint").as("id_b") +:
      col("block").as("block") +:
      fields.map(f => col(f).as(s"b_$f")): _*)
    val mask = fields.zipWithIndex.map { case (f, i) =>
      when(col(s"a_$f") <=> col(s"b_$f"), shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    l.join(r, "block")
      .filter(col("id_a") =!= col("id_b"))
      .select(mask.as("pattern"))
      .groupBy(col("pattern")).agg(count(lit(1)).as("cnt"))
  }

  /** Fellegi-Sunter m/u/prevalence estimation by EM — the half of
    * record linkage the hand-tuned [[FieldRule]] weights punt on:
    * m_i = P(field i agrees | true match), u_i = P(agrees | non-
    * match), p = match prevalence among blocked candidates. Log-odds
    * weights derive as ln(m/u) / ln((1-m)/(1-u)).
    *
    * EM runs over the agreement-pattern HISTOGRAM, not pairs: under
    * conditional independence the E-step posterior depends only on
    * the pattern, so one [[agreementPatterns]] aggregation collapses
    * the candidate set to <= 2^F rows and the iteration is pure
    * bounded driver work (the C75 driver-decision pattern — no
    * per-iteration corpus pass, driver state is 2F+1 longs).
    *
    * INTEGER-EXACT and engine-portable: parameters are micro-units
    * quantized (floor) after every step; E-step numerators are exact
    * BigInt products of micro ints (the twin's largest intermediate
    * is the E-step numerator product·10^6 < 10^(6(F+2)), inside
    * HUGEINT's 1.7e38 for F <= 4); every division is floor on
    * non-negatives. The
    * DuckDB twin ([[estimateEmSql]]) unrolls the same iterations as
    * CTEs in HUGEINT and matches bit-for-bit — the C99 fitSqlCtes
    * device. Parameters are clamped to [1, 999999] micro so no
    * product collapses to zero (mirrored in the twin).
    *
    * Initialization (the part EM is famously sensitive to): m_i
    * starts at 0.9, p at 0.1, and u_i — unless overridden — at each
    * field's OBSERVED agreement rate over the candidate pairs, which
    * approximates the nonmatch agreement rate whenever matches are
    * the minority of blocked candidates (the realistic regime).
    * Symmetric textbook inits (u = 0.1 for every field) make a
    * half-agreeing junk field initially look as informative as the
    * true identifier and EM can latch onto the wrong mixture.
    *
    * @return one row per field: (field_idx, field, m_micro, u_micro,
    *         p_micro) — p_micro repeated on every row
    */
  def estimateEm(left: DataFrame, right: DataFrame, fields: Seq[String],
      iters: Int, mInitMicro: Long = 900000L,
      uInitMicro: Option[Long] = None,
      pInitMicro: Long = 100000L): DataFrame = {
    require(iters >= 1 && fields.size <= 4,
      "iters >= 1; F <= 4 keeps E-step products inside HUGEINT for the twin")
    val spark = left.sparkSession
    val f = fields.size
    val pats = agreementPatterns(left, right, fields)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val M = 1000000L
    def clamp(v: BigInt): Long = v.toLong.max(1L).min(M - 1L)
    val totC = pats.map(p0 => BigInt(p0._2)).sum
    val m = Array.fill(f)(mInitMicro)
    val u = Array.tabulate(f) { i =>
      uInitMicro.getOrElse {
        val agreeC = pats.collect { case (mask, c) if ((mask >> i) & 1L) == 1L => BigInt(c) }.sum
        clamp((agreeC * M) / totC.max(1))
      }
    }
    var p = pInitMicro
    for (_ <- 1 to iters) {
      val w = pats.map { case (mask, cnt) =>
        var a = BigInt(p)
        var b = BigInt(M - p)
        var i = 0
        while (i < f) {
          val g = ((mask >> i) & 1L) == 1L
          a *= BigInt(if (g) m(i) else M - m(i))
          b *= BigInt(if (g) u(i) else M - u(i))
          i += 1
        }
        (mask, BigInt(cnt), (a * M) / (a + b)) // floor; w in micro
      }
      val sumC = w.map(_._2).sum
      val sumWC = w.map { case (_, c, wi) => wi * c }.sum
      val sumNWC = w.map { case (_, c, wi) => (M - wi) * c }.sum
      var i = 0
      while (i < f) {
        val sumWCg = w.collect { case (mask, c, wi) if ((mask >> i) & 1L) == 1L => wi * c }.sum
        val sumNWCg = w.collect { case (mask, c, wi) if ((mask >> i) & 1L) == 1L => (M - wi) * c }.sum
        m(i) = clamp((sumWCg * M) / sumWC.max(1))
        u(i) = clamp((sumNWCg * M) / sumNWC.max(1))
        i += 1
      }
      p = clamp(sumWC / sumC.max(1))
    }
    import spark.implicits._
    fields.zipWithIndex
      .map { case (fl, i) => (i.toLong, fl, m(i), u(i), p) }
      .toDF("field_idx", "field", "m_micro", "u_micro", "p_micro")
  }

  /** DuckDB twin of [[estimateEm]]: the blocked pattern histogram +
    * `iters` unrolled EM CTEs in HUGEINT, bit-identical arithmetic.
    */
  def estimateEmSql(leftSql: String, rightSql: String, fields: Seq[String],
      iters: Int, mInitMicro: Long = 900000L,
      uInitMicro: Option[Long] = None,
      pInitMicro: Long = 100000L): String = {
    require(iters >= 1 && fields.size <= 4,
      "iters >= 1; F <= 4 keeps E-step products inside HUGEINT")
    val M = 1000000L
    val f = fields.size
    val mask = fields.zipWithIndex.map { case (fl, i) =>
      s"CASE WHEN a.$fl IS NOT DISTINCT FROM b.$fl THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    val init = (0 until f).map { i =>
      val uExpr = uInitMicro match {
        case Some(v) => s"CAST($v AS HUGEINT)"
        case None =>
          s"""greatest(1, least(${M - 1},
             |      (SUM(CASE WHEN (mask >> $i) & 1 = 1 THEN CAST(cnt AS HUGEINT) ELSE 0 END) * $M)
             |        // greatest(1, SUM(CAST(cnt AS HUGEINT)))))""".stripMargin
      }
      s"CAST($mInitMicro AS HUGEINT) AS m$i, $uExpr AS u$i"
    }.mkString(", ")
    val chains = (1 to iters).map { t =>
      val aProd = (0 until f).map(i =>
        s"(CASE WHEN (pat.mask >> $i) & 1 = 1 THEN e.m$i ELSE $M - e.m$i END)")
        .mkString(" * ")
      val bProd = (0 until f).map(i =>
        s"(CASE WHEN (pat.mask >> $i) & 1 = 1 THEN e.u$i ELSE $M - e.u$i END)")
        .mkString(" * ")
      val mUpd = (0 until f).map { i =>
        s"""greatest(1, least(${M - 1},
           |      (SUM(CASE WHEN (mask >> $i) & 1 = 1 THEN w * cnt ELSE 0 END) * $M)
           |        // greatest(1, SUM(w * cnt)))) AS m$i,
           |    greatest(1, least(${M - 1},
           |      (SUM(CASE WHEN (mask >> $i) & 1 = 1 THEN ($M - w) * cnt ELSE 0 END) * $M)
           |        // greatest(1, SUM(($M - w) * cnt)))) AS u$i""".stripMargin
      }.mkString(",\n    ")
      s"""w$t AS (
         |  SELECT pat.mask, CAST(pat.cnt AS HUGEINT) AS cnt,
         |    ((e.p * $aProd) * $M) // (e.p * $aProd + ($M - e.p) * $bProd) AS w
         |  FROM pat, em${t - 1} e),
         |em$t AS (
         |  SELECT
         |    $mUpd,
         |    greatest(1, least(${M - 1}, SUM(w * cnt) // greatest(1, SUM(cnt)))) AS p
         |  FROM w$t)""".stripMargin
    }.mkString(",\n")
    val finalRows = fields.zipWithIndex.map { case (fl, i) =>
      s"""SELECT CAST($i AS BIGINT) AS field_idx, '$fl' AS field,
         |  CAST(m$i AS BIGINT) AS m_micro, CAST(u$i AS BIGINT) AS u_micro,
         |  CAST(p AS BIGINT) AS p_micro FROM em$iters""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH la AS ($leftSql), rb AS ($rightSql),
       |pat AS (SELECT CAST($mask AS BIGINT) AS mask, count(*) AS cnt
       |        FROM la a JOIN rb b ON a.block = b.block AND a.rid <> b.rid
       |        GROUP BY 1),
       |em0 AS (SELECT $init, CAST($pInitMicro AS HUGEINT) AS p${if (uInitMicro.isEmpty) " FROM pat" else ""}),
       |$chains
       |$finalRows
       |ORDER BY field_idx""".stripMargin
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
    // mirror [[score]]'s guards so both engines reject the same inputs
    require(rules.nonEmpty && rules.size <= 62, "1..62 rules")
    require(tMatch >= tPossible, "tMatch >= tPossible")
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
