package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads are opaque `binary`
  * columns with typed metadata. The Spark-side plumbing — schema,
  * partition sizing, per-partition batch decode shape — is real and
  * tested; the actual media decode is STUBBED (no codec libraries in
  * this container) behind [[FakeDecoder]], a deterministic
  * byte-driven stand-in with the same signature a real decoder
  * (e.g. javacv / a JNI codec) would have.
  */
object Multimodal {

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
  object FakeDecoder {
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
    * Decode is the [[FakeDecoder]] stub; the hash arithmetic, batch
    * shape (mapPartitions, codec init amortized), and signature
    * schema are the production shape.
    */
  def perceptualHash(media: DataFrame, bits: Int = 64): DataFrame = {
    require(bits >= 2 && bits <= 64, "bits must be in [2, 64]")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { rows =>
        // real decoder: init codec context once per partition here
        rows.map { r =>
          val grid = FakeDecoder.decode(r.payload, bits)
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
  def nearDupMedia(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs(
      perceptualHash(media)
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
  def extractFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { rows =>
        // real decoder: init codec context once per partition here
        rows.map { r =>
          val crc = new java.util.zip.CRC32()
          if (r.payload != null) crc.update(r.payload)
          MediaFeatures(
            r.media_id,
            r.media_type,
            if (r.payload == null) 0L else r.payload.length.toLong,
            crc.getValue,
            FakeDecoder.decode(r.payload, dim))
        }
      }
  }
}
