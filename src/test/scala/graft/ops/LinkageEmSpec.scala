package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** C113b: Fellegi-Sunter m/u/prevalence EM estimation. */
class LinkageEmSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("agreementPatterns histograms the blocked pairs by mask") {
    val left = Seq((1L, 10L, "x"), (2L, 10L, "y")).toDF("rid", "block", "name")
    val right = Seq((11L, 10L, "x"), (12L, 10L, "z")).toDF("rid", "block", "name")
    val got = RecordLinkage.agreementPatterns(left, right, Seq("name"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (1,11) agrees; (1,12), (2,11), (2,12) disagree
    assert(got == Map(1L -> 1L, 0L -> 3L))
  }

  test("one EM step matches the hand computation in exact micro units") {
    // pattern histogram {agree: 1, disagree: 3}; m0=.9 u0=.1 p0=.5
    // E: w(agree) = .5*.9/(.5*.9+.5*.1) = .9 -> 900000 micro
    //    w(disagree) = .5*.1/(.5*.1+.5*.9) = .1 -> 100000
    // M: sumWC = 900000 + 3*100000 = 1.2e6; sumNWC = 1e5 + 3*9e5 = 2.8e6
    //    m = floor(9e5*1e6/1.2e6) = 750000
    //    u = floor(1e5*1e6/2.8e6) = 35714
    //    p = floor(1.2e6/4) = 300000
    val left = Seq((1L, 10L, "x"), (2L, 10L, "y")).toDF("rid", "block", "name")
    val right = Seq((11L, 10L, "x"), (12L, 10L, "z")).toDF("rid", "block", "name")
    val r = RecordLinkage.estimateEm(left, right, Seq("name"), iters = 1,
        uInitMicro = Some(100000L), pInitMicro = 500000L)
      .collect()(0)
    assert(r.getAs[String]("field") == "name")
    assert(r.getAs[Long]("m_micro") == 750000L)
    assert(r.getAs[Long]("u_micro") == 35714L)
    assert(r.getAs[Long]("p_micro") == 300000L)
  }

  test("EM separates the discriminative field from noise on a planted fixture") {
    // 10 blocks of 10x10 candidates: 100 true pairs (name agrees
    // exactly on its twin) among 1000 — the realistic minority-match
    // regime. The junk field agrees ~half the time in BOTH classes.
    // EM must find m(name) >> u(name) while the junk field stays
    // uninformative (m - u small next to name's separation).
    val left = (1 to 100).map(i =>
      (i.toLong, (i % 10).toLong, s"n$i", (i % 2).toString))
      .toDF("rid", "block", "name", "junk")
    val right = (1 to 100).map { i =>
      (i.toLong + 1000L, (i % 10).toLong, s"n$i", ((i / 2) % 2).toString)
    }.toDF("rid", "block", "name", "junk")
    val got = RecordLinkage.estimateEm(left, right, Seq("name", "junk"), iters = 5)
      .collect().map(r => r.getAs[String]("field") ->
        (r.getAs[Long]("m_micro"), r.getAs[Long]("u_micro"))).toMap
    val (mName, uName) = got("name")
    val (mJunk, uJunk) = got("junk")
    info(s"name m=$mName u=$uName junk m=$mJunk u=$uJunk")
    assert(mName > 5L * uName.max(1L), s"name not discriminative: $mName vs $uName")
    assert(mName - uName > 3L * (mJunk - uJunk).max(1L),
      s"junk separation rivals name: name ${mName - uName} vs junk ${mJunk - uJunk}")
  }

  test("estimateEmSql embeds the same inits, clamps, and iteration depth") {
    val sql = RecordLinkage.estimateEmSql("SELECT 1", "SELECT 2",
      Seq("name", "seg"), iters = 3)
    assert(sql.contains("em0") && sql.contains("em3") && !sql.contains("em4"))
    assert(sql.contains("900000") && sql.contains("100000"))
    assert(sql.contains("FROM pat"), "data-derived u init must aggregate over pat")
    assert(sql.contains("greatest(1, least(999999"))
    assert(sql.contains("IS NOT DISTINCT FROM"))
  }
}
