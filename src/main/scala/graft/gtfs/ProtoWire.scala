package graft.gtfs

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal protobuf wire-format layer (public encoding: varint /
  * 64-bit / length-delimited / 32-bit, tag = field<<3 | wireType).
  * Used by [[GtfsRtProto]] to emit GTFS-RT FeedMessage bytes the way
  * the reference serves them (realtime.py:300:
  * `ParseDict(...).SerializeToString()`), without a protobuf
  * dependency. The Reader exists for specs: an independent decode of
  * whatever the Writer (or any protobuf implementation) produced.
  */
object ProtoWire {

  final val WireVarint = 0
  final val WireFixed64 = 1
  final val WireLengthDelimited = 2
  final val WireFixed32 = 5

  /** Append-only message writer. Callers must emit fields in
    * field-number order to byte-match canonical protobuf
    * serialization (C++/Python serialize sorted by field number).
    */
  final class Writer {
    private val buf = new ByteArrayOutputStream(64)

    def result: Array[Byte] = buf.toByteArray

    def varintRaw(value: Long): Unit = {
      var v = value
      while ((v & ~0x7fL) != 0L) {
        buf.write(((v & 0x7f) | 0x80).toInt)
        v = v >>> 7
      }
      buf.write(v.toInt)
    }

    private def tag(field: Int, wire: Int): Unit = varintRaw((field.toLong << 3) | wire)

    /** int32/int64/uint32/uint64/enum/bool: varint encoding.
      * Negative int32 values sign-extend to 64 bits (10-byte varint),
      * as protobuf requires.
      */
    def varint(field: Int, value: Long): Unit = { tag(field, WireVarint); varintRaw(value) }

    def string(field: Int, value: String): Unit =
      bytes(field, value.getBytes("UTF-8"))

    def bytes(field: Int, value: Array[Byte]): Unit = {
      tag(field, WireLengthDelimited)
      varintRaw(value.length.toLong)
      buf.write(value, 0, value.length)
    }

    /** Nested message (length-delimited). Empty messages are still
      * emitted — an explicitly-present empty proto2 submessage
      * serializes as tag + zero length.
      */
    def message(field: Int, encoded: Array[Byte]): Unit = bytes(field, encoded)

    def float32(field: Int, value: Float): Unit = {
      tag(field, WireFixed32)
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(value)
      buf.write(bb.array(), 0, 4)
    }

    def double64(field: Int, value: Double): Unit = {
      tag(field, WireFixed64)
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(value)
      buf.write(bb.array(), 0, 8)
    }
  }

  /** Decoded field value (spec-side). */
  sealed trait PValue
  final case class PVarint(value: Long) extends PValue
  final case class PFixed64(value: Long) extends PValue
  final case class PFixed32(value: Int) extends PValue
  final case class PBytes(value: Array[Byte]) extends PValue {
    def utf8: String = new String(value, "UTF-8")
    def fields: Seq[(Int, PValue)] = parse(value)
  }

  /** Parse a message into its (fieldNumber, value) sequence, in wire
    * order. Throws on truncated input or unknown wire types.
    */
  def parse(bytes: Array[Byte]): Seq[(Int, PValue)] = {
    val out = Seq.newBuilder[(Int, PValue)]
    var pos = 0

    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        require(pos < bytes.length, s"truncated varint at $pos")
        val b = bytes(pos)
        pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }

    while (pos < bytes.length) {
      val key = readVarint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      require(field > 0, s"invalid field number at $pos")
      wire match {
        case WireVarint => out += field -> PVarint(readVarint())
        case WireFixed64 =>
          require(pos + 8 <= bytes.length, "truncated fixed64")
          out += field -> PFixed64(
            ByteBuffer.wrap(bytes, pos, 8).order(ByteOrder.LITTLE_ENDIAN).getLong)
          pos += 8
        case WireLengthDelimited =>
          val len = readVarint().toInt
          require(pos + len <= bytes.length, "truncated length-delimited field")
          out += field -> PBytes(java.util.Arrays.copyOfRange(bytes, pos, pos + len))
          pos += len
        case WireFixed32 =>
          require(pos + 4 <= bytes.length, "truncated fixed32")
          out += field -> PFixed32(
            ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt)
          pos += 4
        case other => throw new IllegalArgumentException(s"unsupported wire type $other")
      }
    }
    out.result()
  }
}
