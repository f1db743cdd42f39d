package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads are opaque `binary`
  * columns with typed metadata. The Spark-side plumbing — schema,
  * partition sizing, per-partition batch decode shape — is real and
  * tested. Decode is PLUGGABLE behind [[Multimodal.MediaDecoder]]:
  * [[Multimodal.ImageIoDecoder]] is a real JPEG/PNG/BMP/GIF image
  * decoder (javax.imageio ships with the JDK — no external codec
  * needed), [[Multimodal.FakeDecoder]] is the deterministic
  * byte-driven stand-in the reproducible specs use and the slot where
  * an audio/video codec (javacv, a JNI wrapper) would plug in.
  */
object Multimodal {

  /** Decoder contract: payload bytes → `dim` feature cells. MUST
    * return all-zeros (never throw) on undecodable payloads — at
    * crawl scale corrupt media is routine, and a poison payload must
    * not kill the task; zero vectors are quarantined downstream by
    * checksum/metadata instead.
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** A media row: payload plus the metadata a catalog would carry. */
  case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features: fixed-width vector + decode metadata. */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  /** Wrap arbitrary content as a media table: binary payload + typed
    * metadata columns (the shape a 100 TB object-store scan lands as).
    */
  def packBinary(df: DataFrame, id: Column, content: Column, mediaType: String): DataFrame =
    df.select(
      id.cast("bigint").as("media_id"),
      lit(mediaType).as("media_type"),
      content.cast("binary").as("payload"))

  /** Cheap metadata pass — pure column expressions, no decode:
    * payload size and crc32 checksum.
    */
  def withMetadata(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("bigint"))
      .withColumn("checksum", crc32(col("payload")))

  /** STUB: deterministic fake decoder. A real implementation decodes
    * the payload (image decode / audio PCM / video frame-sample) and
    * emits a feature vector; this stand-in derives `dim` floats from
    * payload bytes so the distributed plumbing (partition batching,
    * feature schema, downstream joins) is exercised end-to-end with
    * reproducible values.
    */
  object FakeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload == null || payload.isEmpty) return out
      var i = 0
      var acc = 17L
      while (i < payload.length) {
        acc = acc * 31 + payload(i)
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      var j = 0
      while (j < dim) { out(j) = out(j) + (acc % 97) / 970.0f; j += 1 }
      out
    }
  }

  /** Real image decode via `javax.imageio` (JPEG/PNG/BMP/GIF readers
    * ship with the JDK): decode the payload, average pixel luminance
    * (ITU-R BT.601 weights) into a gx×gy cell grid flattened to `dim`
    * floats in [0,1] — the classic aHash downscale (dim=64 → the 8×8
    * grid). Works headless; undecodable or empty payloads return the
    * zero vector per the [[MediaDecoder]] contract. Each cell is the
    * mean of its pixel block, so the grid — and the mean-thresholded
    * hash over it — is invariant to re-encoding (PNG↔JPEG) and robust
    * to resizing.
    */
  object ImageIoDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload == null || payload.isEmpty) return out
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) return out
      val (w, h) = (img.getWidth, img.getHeight)
      if (w == 0 || h == 0) return out
      val gx = math.max(1, math.ceil(math.sqrt(dim.toDouble)).toInt)
      val gy = math.max(1, math.ceil(dim.toDouble / gx).toInt)
      val sums = new Array[Double](dim)
      val counts = new Array[Long](dim)
      var y = 0
      while (y < h) {
        val cy = math.min(gy - 1, y * gy / h)
        var x = 0
        while (x < w) {
          val cx = math.min(gx - 1, x * gx / w)
          val cell = math.min(dim - 1, cy * gx + cx)
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          sums(cell) += lum / 255.0
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      var c = 0
      while (c < dim) {
        if (counts(c) > 0) out(c) = (sums(c) / counts(c)).toFloat
        c += 1
      }
      out
    }
  }

  /** Real audio decode via `javax.sound.sampled` (WAV/AIFF/AU PCM
    * readers ship with the JDK): downmix to mono and reduce the
    * waveform to a `dim`-window RMS energy envelope in [0,1] — the
    * audio analog of [[ImageIoDecoder]]'s luminance grid, and like it
    * robust to re-encoding of the same signal (sample-rate and
    * bit-depth changes preserve the envelope). Same contract:
    * undecodable, empty or non-PCM payloads return the zero vector.
    * Supports 8/16-bit PCM, any channel count, either endianness.
    */
  object WavDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload == null || payload.isEmpty) return out
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val ais =
        try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (ais == null) return out
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        if (!signed && enc != AudioFormat.Encoding.PCM_UNSIGNED) return out
        val bps = fmt.getSampleSizeInBits / 8
        if (bps != 1 && bps != 2) return out
        val ch = math.max(1, fmt.getChannels)
        val data = ais.readAllBytes()
        val frameBytes = bps * ch
        val n = data.length / frameBytes
        if (n == 0) return out
        val mono = new Array[Double](n)
        var i = 0
        while (i < n) {
          var s = 0.0
          var c = 0
          while (c < ch) {
            val off = i * frameBytes + c * bps
            s += (if (bps == 2) {
              val (b0, b1) = (data(off) & 0xff, data(off + 1) & 0xff)
              val raw = if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
              (if (signed) raw.toShort.toInt else raw - 32768) / 32768.0
            } else {
              (if (signed) data(off).toInt else (data(off) & 0xff) - 128) / 128.0
            })
            c += 1
          }
          mono(i) = s / ch
          i += 1
        }
        var w = 0
        while (w < dim) {
          val lo = (w.toLong * n / dim).toInt
          val hi = ((w + 1).toLong * n / dim).toInt
          if (hi > lo) {
            var acc = 0.0
            var j = lo
            while (j < hi) { acc += mono(j) * mono(j); j += 1 }
            out(w) = math.sqrt(acc / (hi - lo)).toFloat
          }
          w += 1
        }
        out
      } catch { case _: Exception => new Array[Float](dim) }
      finally ais.close()
    }
  }

  /** A sampled frame row: 1 media row explodes into up to
    * `maxFrames` of these.
    */
  case class MediaFrame(
      media_id: Long,
      frame_index: Long,
      frame_bytes: Array[Byte])

  /** STUB resize: a real implementation decodes, scales to
    * targetBytes-worth of pixels, re-encodes; the stand-in
    * deterministically truncates or cycle-pads the payload so the
    * binary→binary transform shape (and downstream size accounting)
    * is exercised for real.
    */
  def resizeStub(media: DataFrame, targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { rows =>
        // real decoder: image scaling context init once per partition
        rows.map { r =>
          val src = if (r.payload == null) Array.emptyByteArray else r.payload
          val out = new Array[Byte](targetBytes)
          if (src.nonEmpty) {
            var i = 0
            while (i < targetBytes) { out(i) = src(i % src.length); i += 1 }
          }
          MediaRecord(r.media_id, r.media_type, out)
        }
      }.toDF("media_id", "media_type", "payload")
  }

  /** STUB frame sampling: the cardinality-CHANGING multimodal shape —
    * one video row becomes up to `maxFrames` frame rows (every
    * `everyNth` fixed-size chunk of the payload stands in for a
    * decoded frame). The flatMap shape, frame indexing, and output
    * schema are exactly what a real video decoder feeds downstream;
    * at 100 TB this is the stage that dictates partition sizing
    * (output rows = input rows × frames).
    */
  def frameSample(
      media: DataFrame,
      frameBytes: Int,
      everyNth: Int,
      maxFrames: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val src = if (r.payload == null) Array.emptyByteArray else r.payload
          val nChunks = src.length / frameBytes
          Iterator.range(0, nChunks)
            .filter(_ % everyNth == 0)
            .take(maxFrames)
            .map { c =>
              MediaFrame(r.media_id, c.toLong,
                java.util.Arrays.copyOfRange(src, c * frameBytes, (c + 1) * frameBytes))
            }
        }
      }
  }

  /** Perceptual hash (aHash-family) per media row: decode to a
    * `bits`-cell grayscale grid, threshold each cell against the
    * grid mean, pack into a 64-bit signature. Mean-thresholding makes
    * the hash invariant to uniform brightness shifts, so re-encoded /
    * slightly-edited copies land within a small hamming distance.
    * Decode is pluggable: [[ImageIoDecoder]] for real JPEG/PNG
    * payloads, [[FakeDecoder]] (default) for deterministic
    * byte-driven specs; the hash arithmetic, batch shape
    * (mapPartitions, codec init amortized), and signature schema are
    * the production shape either way.
    */
  def perceptualHash(media: DataFrame, bits: Int = 64,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    require(bits >= 2 && bits <= 64, "bits must be in [2, 64]")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { rows =>
        // decoder rides the closure; codec state init amortizes here
        rows.map { r =>
          val grid = decoder.decode(r.payload, bits)
          var mean = 0.0
          var i = 0
          while (i < bits) { mean += grid(i); i += 1 }
          mean /= bits
          var sig = 0L
          i = 0
          while (i < bits) {
            if (grid(i) > mean) sig |= (1L << i)
            i += 1
          }
          (r.media_id, sig)
        }
      }.toDF("media_id", "phash")
  }

  /** Near-duplicate media pairs by perceptual hash: pigeonhole
    * 4×16-bit chunk candidates (guaranteed complete for
    * maxHamming <= 3) + exact hamming verify — the image analog of
    * document SimHash dedup, sharing its candidate/verify plumbing.
    * Shuffles only (media_id, 8-byte signature) rows, never payloads.
    */
  def nearDupMedia(media: DataFrame, maxHamming: Int = 3,
      decoder: MediaDecoder = FakeDecoder): DataFrame =
    Dedup.hammingPairs(
      perceptualHash(media, decoder = decoder)
        .select(col("media_id").as("doc_id"), col("phash").as("simhash")),
      chunkBits = 16, maxHamming = maxHamming)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"), col("hamming"))

  /** Per-partition batch feature extraction over the media table —
    * the mapPartitions shape a real decoder needs (amortize codec
    * init across a partition, stream rows, never materialize the
    * partition). Input partitioning is preserved; size partitions
    * upstream via `spark.sql.files.maxPartitionBytes` so payload
    * batches fit executor memory.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { rows =>
        // decoder rides the closure; codec state init amortizes here
        rows.map { r =>
          val crc = new java.util.zip.CRC32()
          if (r.payload != null) crc.update(r.payload)
          MediaFeatures(
            r.media_id,
            r.media_type,
            if (r.payload == null) 0L else r.payload.length.toLong,
            crc.getValue,
            decoder.decode(r.payload, dim))
        }
      }
  }
}
