package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental bucket fold must equal the batch census however the
  * stream chunks arrivals; redelivery skipped; out-of-order loud. */
class StreamAspectSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    def png(id: Long, w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, "image/png", bos.toByteArray)
    }
    Seq(png(1L, 32, 32), png(2L, 64, 36), png(3L, 40, 30),
      png(4L, 30, 40), png(5L, 33, 32), png(6L, 64, 36))
      .toDF("doc_id", "mime", "payload")
  }

  test("chunked fold == batch m16 census; redelivery skipped; out-of-order throws") {
    val expected = graft.ops.Multimodal.aspectBuckets(media).toDF()
      .groupBy(col("bucket_w"), col("bucket_h")).agg(count(lit(1)).as("n_images"))
      .orderBy(col("bucket_w"), col("bucket_h"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val work = Files.createTempDirectory("graft_sasp").toString
    StreamAspect.applyBatch(s"$work/agg", media.filter(col("doc_id") <= 3), 0L)
    StreamAspect.applyBatch(s"$work/agg", media.filter(col("doc_id") > 3), 1L)
    val got = StreamAspect.summary(spark, s"$work/agg")
      .orderBy(col("bucket_w"), col("bucket_h"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(4))).toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")

    StreamAspect.applyBatch(s"$work/agg", media.filter(col("doc_id") > 3), 2L)
    val after = StreamAspect.summary(spark, s"$work/agg")
      .orderBy(col("bucket_w"), col("bucket_h"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(4))).toSeq
    assert(after == got, "replayed batch must not double-count buckets")

    val ex = intercept[IllegalStateException] {
      StreamAspect.applyBatch(s"$work/agg", media.filter(col("doc_id") <= 3), 3L)
    }
    assert(ex.getMessage.contains("out-of-order"), ex.getMessage)
  }
}
