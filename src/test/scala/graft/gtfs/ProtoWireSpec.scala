package graft.gtfs

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.gtfs.ProtoWire.{PBytes, PFixed32, PFixed64, PVarint}

/** Property checks for the wire layer: whatever the Writer emits, the
  * independent Reader parses back to the same (field, value) stream —
  * across random field numbers, extreme varints (negative int32 sign
  * extension, Long.MinValue/MaxValue), nested messages, and floats.
  */
class ProtoWireSpec extends AnyFunSuite {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  sealed private trait FV
  private case class V(f: Int, v: Long) extends FV
  private case class S(f: Int, s: String) extends FV
  private case class F32(f: Int, v: Float) extends FV
  private case class D64(f: Int, v: Double) extends FV

  private val fvGen: Gen[FV] = for {
    f <- Gen.choose(1, 536870911) // max proto field number 2^29-1
    fv <- Gen.oneOf(
      Gen.oneOf(Gen.choose(Long.MinValue, Long.MaxValue), Gen.oneOf(
        Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue, Int.MinValue.toLong))).map(V(f, _)),
      Gen.asciiPrintableStr.map(S(f, _)),
      Gen.choose(-1e9f, 1e9f).map(F32(f, _)),
      Gen.choose(-1e12, 1e12).map(D64(f, _)))
  } yield fv

  test("writer -> reader roundtrips arbitrary field streams") {
    for (seed <- 1L to 30L) {
      val fields = sample(Gen.listOfN(sample(Gen.choose(0, 20), seed), fvGen), seed * 7)
      val w = new ProtoWire.Writer
      fields.foreach {
        case V(f, v) => w.varint(f, v)
        case S(f, s) => w.string(f, s)
        case F32(f, v) => w.float32(f, v)
        case D64(f, v) => w.double64(f, v)
      }
      val parsed = ProtoWire.parse(w.result)
      assert(parsed.length == fields.length)
      fields.zip(parsed).foreach {
        case (V(f, v), (pf, PVarint(pv))) => assert(pf == f && pv == v)
        case (S(f, s), (pf, b: PBytes)) => assert(pf == f && b.utf8 == s)
        case (F32(f, v), (pf, PFixed32(bits))) =>
          assert(pf == f && java.lang.Float.intBitsToFloat(bits) == v)
        case (D64(f, v), (pf, PFixed64(bits))) =>
          assert(pf == f && java.lang.Double.longBitsToDouble(bits) == v)
        case (exp, got) => fail(s"mismatch: $exp vs $got")
      }
    }
  }

  test("nested messages roundtrip at depth") {
    val leaf = new ProtoWire.Writer
    leaf.varint(1, -42L) // 10-byte sign-extended varint
    leaf.string(2, "käse 🚋") // multi-byte UTF-8
    val mid = new ProtoWire.Writer
    mid.message(3, leaf.result)
    mid.varint(4, Long.MaxValue)
    val top = new ProtoWire.Writer
    top.message(1, mid.result)
    top.message(1, Array.emptyByteArray) // explicitly-present empty message

    val parsed = ProtoWire.parse(top.result)
    assert(parsed.length == 2)
    val Seq((1, m: PBytes), (1, e: PBytes)) = parsed
    assert(e.value.isEmpty)
    val midFields = m.fields
    assert(midFields.collect { case (4, PVarint(v)) => v } == Seq(Long.MaxValue))
    val leafFields = midFields.collect { case (3, b: PBytes) => b.fields }.head
    assert(leafFields.collect { case (1, PVarint(v)) => v } == Seq(-42L))
    assert(leafFields.collect { case (2, b: PBytes) => b.utf8 } == Seq("käse 🚋"))
  }

  test("reader rejects truncated input") {
    val w = new ProtoWire.Writer
    w.string(1, "hello")
    val bytes = w.result
    intercept[IllegalArgumentException] { ProtoWire.parse(bytes.dropRight(1)) }
    intercept[IllegalArgumentException] { ProtoWire.parse(Array[Byte](0x08.toByte)) } // tag, no value
  }
}
