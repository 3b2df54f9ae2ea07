package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental band fold must equal the batch calibrationCurve over
  * the same labeled rows; exact redelivery must be skipped (additive
  * counters would double-fold); out-of-order arrival must fail loudly. */
class StreamCalibrationSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    val docs = Seq(
      (1L, "good clean prose text here"), (2L, "good clean prose again here"),
      (3L, "zz xx qq spam spam spam"), (4L, "zz xx qq spam junk junk"),
      (5L, "good clean text again"), (6L, "qq spam zz junk xx")
    ).toDF("doc_id", "text")
    val labels = Seq((1L, true), (2L, true), (3L, false), (4L, false),
      (5L, true), (6L, false)).toDF("doc_id", "lab")
    (docs, labels)
  }

  test("chunked fold == batch calibrationCurve; redelivery skipped; out-of-order throws") {
    val (docs, labels) = fixture
    val (model, consts) = graft.ops.CorpusStats.nbTrain(docs, "doc_id", "text", labels)
    model.cache(); consts.cache()
    val scored = graft.ops.CorpusStats.nbQualityScore(docs, "doc_id", "text", labels)
    val expected = graft.ops.CorpusStats.calibrationCurve(scored, "score_q", labels)
      .orderBy(col("bin")).collect().toSeq

    val work = Files.createTempDirectory("graft_scal").toString
    val labeled = docs.join(labels, Seq("doc_id"))
    StreamCalibration.applyBatch(model, consts, s"$work/agg",
      labeled.filter(col("doc_id") <= 2), 0L)
    StreamCalibration.applyBatch(model, consts, s"$work/agg",
      labeled.filter(col("doc_id") > 2 && col("doc_id") <= 4), 1L)
    StreamCalibration.applyBatch(model, consts, s"$work/agg",
      labeled.filter(col("doc_id") > 4), 2L)
    val got = StreamCalibration.summary(spark, s"$work/agg")
      .orderBy(col("bin")).collect().toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")

    // bit-exact replay of the latest batch: a no-op
    StreamCalibration.applyBatch(model, consts, s"$work/agg",
      labeled.filter(col("doc_id") > 4), 3L)
    val after = StreamCalibration.summary(spark, s"$work/agg")
      .orderBy(col("bin")).collect().toSeq
    assert(after == got, "replayed batch must not double-count bands")

    // genuinely out-of-order (overlapping, not identical) throws
    val ex = intercept[IllegalStateException] {
      StreamCalibration.applyBatch(model, consts, s"$work/agg",
        labeled.filter(col("doc_id") <= 2), 4L)
    }
    assert(ex.getMessage.contains("out-of-order"), ex.getMessage)
  }
}
