package graft.ops

import java.util.zip.CRC32

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("binary packing + metadata + batch feature extraction") {
    val df = Seq((1L, "hello media"), (2L, "")).toDF("id", "content")
    val media = Multimodal.packBinary(df, col("id"), col("content"), "text/plain")
    assert(media.schema("payload").dataType.typeName == "binary")

    val withMeta = Multimodal.withMetadata(media)
    val metaRow = withMeta.filter(col("media_id") === 1).first()
    assert(metaRow.getAs[Long]("n_bytes") == 11L)
    val crc = new CRC32(); crc.update("hello media".getBytes("UTF-8"))
    assert(metaRow.getAs[Long]("checksum") == crc.getValue)

    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 11L)
    assert(feats(1L).checksum == crc.getValue)
    assert(feats(1L).feature.length == 8)
    // deterministic: same payload -> same features
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(again(1L) == feats(1L).feature.toSeq)
    // empty payload -> zero vector, zero checksum
    assert(feats(2L).feature.forall(_ == 0.0f))
  }

  test("resize stub normalizes payload size, deterministic") {
    val df = Seq((1L, "abcdefgh"), (2L, "xy"), (3L, "")).toDF("id", "content")
    val media = Multimodal.packBinary(df, col("id"), col("content"), "image/fake")
    val resized = Multimodal.resizeStub(media, targetBytes = 4)
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("payload")).toMap
    assert(resized.values.forall(_.length == 4)) // every payload at target size
    assert(new String(resized(1L), "UTF-8") == "abcd") // truncation
    assert(new String(resized(2L), "UTF-8") == "xyxy") // cycle-pad
    assert(resized(3L).forall(_ == 0)) // empty stays zeros
  }

  test("frame sampling explodes one media row into indexed frame rows") {
    // 40-byte payload, 8-byte frames -> chunks 0..4; every 2nd -> 0,2,4; max 2 -> 0,2
    val payload = ("0123456789" * 4)
    val media = Multimodal.packBinary(
      Seq((7L, payload)).toDF("id", "content"), col("id"), col("content"), "video/fake")
    val frames = Multimodal.frameSample(media, frameBytes = 8, everyNth = 2, maxFrames = 2)
      .collect().sortBy(_.frame_index)
    assert(frames.map(_.frame_index).toSeq == Seq(0L, 2L))
    assert(frames.forall(_.media_id == 7L))
    assert(new String(frames(0).frame_bytes, "UTF-8") == "01234567")
    assert(new String(frames(1).frame_bytes, "UTF-8") == "67890123")
    // payload shorter than one frame -> no rows, not a partial frame
    val tiny = Multimodal.packBinary(
      Seq((8L, "abc")).toDF("id", "content"), col("id"), col("content"), "video/fake")
    assert(Multimodal.frameSample(tiny, 8, 1, 10).count() == 0)
  }

  test("perceptual hash: deterministic, mean-thresholded, and distinct payloads differ") {
    val base = "the quick brown fox jumps over the lazy dog, twice over"
    val media = Multimodal.packBinary(
      Seq((1L, base), (2L, base), (3L, "completely different payload bytes here !!"))
        .toDF("id", "content"),
      col("id"), col("content"), "image/fake")
    val h = Multimodal.perceptualHash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))        // same bytes -> same hash
    assert(h(1L) != h(3L))        // different bytes -> different hash
    // mean-threshold: roughly balanced bit population, never all-0/all-1
    val pop = java.lang.Long.bitCount(h(1L))
    assert(pop > 0 && pop < 64)
  }

  test("near-dup media: exact copies pair at hamming 0, a small edit stays within range") {
    val base = ("A" * 40) + ("B" * 40) + ("C" * 48)   // 128 bytes, 2 bytes/cell
    val edited = base.updated(5, 'D').toString         // one-byte edit: one grid cell moves
    val far = (1 to 128).map(i => ('a' + (i * 37) % 26).toChar).mkString
    val media = Multimodal.packBinary(
      Seq((1L, base), (2L, base), (3L, edited), (4L, far)).toDF("id", "content"),
      col("id"), col("content"), "image/fake")

    val pairs = Multimodal.nearDupMedia(media, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 0L) // exact copy
    // the single-cell edit pairs with both exact copies at small hamming
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 3L)
    assert(pairs.contains((2L, 3L)))
    // the unrelated payload pairs with nothing
    assert(!pairs.keys.exists(k => k._1 == 4L || k._2 == 4L))
    // plan shape: candidates come from the chunk equi-join, never a cross product
    val plan = Multimodal.nearDupMedia(media, maxHamming = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  // ------------------------------------------------- real image decode

  /** w×h image from a per-pixel gray-level function, encoded with the
    * given javax.imageio format ("png", "jpg").
    */
  private def encode(w: Int, h: Int, fmt: String)(gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = math.max(0, math.min(255, gray(x, y)))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("ImageIoDecoder: real PNG decode feeds the pHash path end-to-end") {
    // fixtures: a horizontal gradient, its lossy JPEG re-encode, a
    // uniformly-brightened copy, a vertical gradient, corrupt bytes
    val horizPng = encode(64, 64, "png")((x, _) => 20 + x * 170 / 63)
    val horizJpg = encode(64, 64, "jpg")((x, _) => 20 + x * 170 / 63)
    val brighter = encode(64, 64, "png")((x, _) => 50 + x * 170 / 63)
    val vertPng = encode(64, 64, "png")((_, y) => 20 + y * 170 / 63)
    val corrupt = Array.tabulate[Byte](100)(i => (i * 7).toByte)

    val media = Multimodal.packBinary(
      Seq((1L, horizPng), (2L, horizJpg), (3L, brighter), (4L, vertPng), (5L, corrupt))
        .toDF("id", "content"),
      col("id"), col("content"), "image")
    val h = Multimodal.perceptualHash(media, decoder = Multimodal.ImageIoDecoder)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // gradient pHash is structured: exactly the brighter half of the
    // 8x8 grid clears the mean -> 32 bits set
    assert(java.lang.Long.bitCount(h(1L)) == 32)
    // lossy re-encode lands within near-dup range of the original
    assert(hamming(h(1L), h(2L)) <= 3, s"png vs jpeg: ${hamming(h(1L), h(2L))}")
    // mean-thresholding absorbs a uniform brightness shift exactly
    assert(h(3L) == h(1L))
    // a genuinely different image is far away
    assert(hamming(h(1L), h(4L)) >= 16)
    // undecodable payload -> zero grid -> empty signature, no crash
    assert(h(5L) == 0L)
  }

  test("near-dup media over real images: re-encode pairs, transpose does not") {
    val horizPng = encode(48, 48, "png")((x, _) => 10 + x * 180 / 47)
    val horizJpg = encode(48, 48, "jpg")((x, _) => 10 + x * 180 / 47)
    val vertPng = encode(48, 48, "png")((_, y) => 10 + y * 180 / 47)
    val media = Multimodal.packBinary(
      Seq((1L, horizPng), (2L, horizJpg), (3L, vertPng)).toDF("id", "content"),
      col("id"), col("content"), "image")
    val pairs = Multimodal.nearDupMedia(media, maxHamming = 3,
        decoder = Multimodal.ImageIoDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  // ------------------------------------------------- real audio decode

  /** PCM samples → a WAV container via the JDK encoder. 16-bit writes
    * signed little-endian; 8-bit follows the WAV unsigned convention.
    */
  private def wav(samples: Array[Short], bits: Int = 16, channels: Int = 1,
      rate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(rate, bits, channels, bits == 16, false)
    val raw = new Array[Byte](samples.length * bits / 8)
    var i = 0
    while (i < samples.length) {
      if (bits == 16) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      } else raw(i) = ((samples(i) / 256) + 128).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavDecoder: RMS envelope of a silence-then-tone signal, bit-depth robust") {
    val n = 8000
    // first half silence, second half a full-scale square wave (RMS = 1)
    val sig = Array.tabulate[Short](n)(i =>
      if (i < n / 2) 0 else if (i % 2 == 0) 32767 else -32767)
    val env = Multimodal.WavDecoder.decode(wav(sig), 8)
    (0 until 4).foreach(w => assert(math.abs(env(w)) < 1e-3, s"window $w"))
    (4 until 8).foreach(w => assert(math.abs(env(w) - 1.0f) < 1e-2, s"window $w"))
    // the 8-bit re-encode of the same signal keeps the envelope
    val env8 = Multimodal.WavDecoder.decode(wav(sig, bits = 8), 8)
    env.zip(env8).foreach { case (a, b) => assert(math.abs(a - b) < 0.02) }
    // stereo downmix: L = -R cancels to silence everywhere
    val st = Array.tabulate[Short](n * 2)(i =>
      if (i % 2 == 0) 12000 else -12000)
    val envSt = Multimodal.WavDecoder.decode(wav(st, channels = 2), 8)
    envSt.foreach(v => assert(math.abs(v) < 1e-3))
    // corrupt payload -> zero vector, no crash
    val bad = Multimodal.WavDecoder.decode(Array.tabulate[Byte](64)(_.toByte), 8)
    assert(bad.forall(_ == 0.0f))
  }

  test("WavDecoder feeds the pHash near-dup path: re-encode pairs, different envelope does not") {
    val n = 8000
    def tone(loudFirst: Boolean) = Array.tabulate[Short](n) { i =>
      val loud = if (loudFirst) i < n / 2 else i >= n / 2
      if (loud) (28000 * math.sin(i * 0.7)).toShort else (600 * math.sin(i * 0.7)).toShort
    }
    val a16 = wav(tone(loudFirst = false))
    val a8 = wav(tone(loudFirst = false), bits = 8)
    val rev = wav(tone(loudFirst = true))
    val media = Multimodal.packBinary(
      Seq((1L, a16), (2L, a8), (3L, rev)).toDF("id", "content"),
      col("id"), col("content"), "audio")
    val h = Multimodal.perceptualHash(media, decoder = Multimodal.WavDecoder)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(h(1L), h(2L)) <= 3, s"16 vs 8 bit: ${hamming(h(1L), h(2L))}")
    // loud-half swapped -> complementary threshold pattern, far away
    assert(hamming(h(1L), h(3L)) >= 32, s"reversed: ${hamming(h(1L), h(3L))}")
  }
}
