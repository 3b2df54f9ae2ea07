package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental edge fold must equal the batch lag-window matrix
  * however the (ordered) stream chunks user chains; exact redelivery
  * must be skipped (additive counts would double-fold); out-of-order
  * arrival must fail loudly. */
class StreamTransitionsSpec extends SparkSpec {

  private def batchMatrix(df: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
    df.select(col("user_id"), col("event_type").as("to_type"),
        lag(col("event_type"), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type")).collect().toSeq
  }

  private def ev = {
    import spark.implicits._
    // user 1's chain crosses BOTH chunk boundaries; user 2's crosses one
    Seq(
      (1L, 1L, "view"), (2L, 2L, "view"), (1L, 3L, "click"),
      (1L, 4L, "view"), (2L, 5L, "click"), (1L, 6L, "purchase"),
      (2L, 7L, "view"), (1L, 8L, "view")).toDF("user_id", "event_id", "event_type")
  }

  test("chunked fold == batch matrix; boundary edges stitched from the lasts state") {
    val work = Files.createTempDirectory("graft_strx").toString
    val lasts = new TxnLogState(s"$work/lasts", spark, 4)
    StreamTransitions.applyBatch(lasts, s"$work/counts", ev.filter(col("event_id") <= 3), 0L)
    StreamTransitions.applyBatch(lasts, s"$work/counts", ev.filter(col("event_id") > 3 && col("event_id") <= 6), 1L)
    StreamTransitions.applyBatch(lasts, s"$work/counts", ev.filter(col("event_id") > 6), 2L)
    val got = StreamTransitions.summary(spark, lasts, s"$work/counts")
      .orderBy(col("from_type"), col("to_type")).collect().toSeq
    assert(got == batchMatrix(ev), s"\ngot      $got\nexpected ${batchMatrix(ev)}")
  }

  test("exact redelivery is skipped; out-of-order arrival fails loudly") {
    val work = Files.createTempDirectory("graft_strx2").toString
    val lasts = new TxnLogState(s"$work/lasts", spark, 4)
    StreamTransitions.applyBatch(lasts, s"$work/counts", ev.filter(col("event_id") <= 6), 0L)
    val before = StreamTransitions.summary(spark, lasts, s"$work/counts")
      .orderBy(col("from_type"), col("to_type")).collect().toSeq
    // bit-exact replay of the most recent batch: a no-op, not a double-fold
    StreamTransitions.applyBatch(lasts, s"$work/counts", ev.filter(col("event_id") <= 6), 1L)
    val after = StreamTransitions.summary(spark, lasts, s"$work/counts")
      .orderBy(col("from_type"), col("to_type")).collect().toSeq
    assert(after == before, "replayed batch must not double-count edges")
    // a genuinely out-of-order batch (overlapping, not identical) throws
    val ex = intercept[IllegalStateException] {
      StreamTransitions.applyBatch(lasts, s"$work/counts", ev.filter(col("event_id") <= 3), 2L)
    }
    assert(ex.getMessage.contains("out-of-order"), ex.getMessage)
  }
}
