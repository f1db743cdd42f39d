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
}
