package graft.streaming

import graft.SparkSpec
import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming perceptual gate must equal the batch brute-force
  * keep-first over its own aHashes, enforce ascending arrival, and fold
  * redelivery idempotently. */
class StreamMediaGateSpec extends SparkSpec {

  import spark.implicits._

  private def png(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      var idx = 0
      while (idx < 64) {
        val base = ((id % 10) * 31 + idx * 17) % 97 < 48
        val flip = id % 4 == 0 && idx == id % 64
        val tone = if (base != flip) 140 else 40
        g.setColor(new java.awt.Color(tone, tone, tone))
        g.fillRect((idx % 8) * 4, (idx / 8) * 4, 4, 4)
        idx += 1
      }
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def media(ids: Seq[Long]) =
    ids.map(id => (id, "image/png", png(id))).toDF("doc_id", "mime", "payload")

  test("chunked gate == brute-force keep-first; ordering enforced; redelivery no-op") {
    val all = media(0L until 40L)
    val work = Files.createTempDirectory("graft_smg").toString
    val state = new TxnLogState(s"$work/state", spark, 8)
    StreamMediaGate.applyBatch(state, all.filter(col("doc_id") < 20), s"$work/out", 0L)
    StreamMediaGate.applyBatch(state, all.filter(col("doc_id") >= 20), s"$work/out", 1L)
    val got = StreamMediaGate.summary(spark, s"$work/out")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

    val hashes = Multimodal.aHash64(all).collect().map(h => h.doc_id -> h.phash)
    val expected = hashes.map { case (b, hb) =>
      b -> hashes.exists { case (a, ha) =>
        a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
      }
    }.toMap
    assert(got == expected,
      s"diff=${expected.toSet.diff(got.toSet)} extra=${got.toSet.diff(expected.toSet)}")
    assert(got.values.count(identity) > 0 && got.values.count(!_) > 0,
      "fixture must exercise both verdicts")

    // bit-exact redelivery of the last chunk folds to the identical log
    StreamMediaGate.applyBatch(state, all.filter(col("doc_id") >= 20), s"$work/out", 2L)
    assert(StreamMediaGate.summary(spark, s"$work/out")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap == got)

    // out-of-order arrival fails loudly, never silently diverges
    val e = intercept[IllegalStateException] {
      StreamMediaGate.applyBatch(state, media(Seq(5L)), s"$work/out", 3L)
    }
    assert(e.getMessage.contains("out-of-order"), e.getMessage)
  }
}
