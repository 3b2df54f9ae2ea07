package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental attribution fold must equal the batch q24 rollup
  * however the (ordered) stream chunks user chains — including a
  * purchase whose touch fell in an EARLIER trigger; exact redelivery
  * must be skipped (additive counts would double-fold); out-of-order
  * arrival must fail loudly. */
class StreamAttributionSpec extends SparkSpec {

  private def batchRollup(df: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("touch", last(
        when(col("event_type") =!= "purchase", col("event_type")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("touch").isNotNull)
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy(col("touch")).collect().toSeq
  }

  private def ev = {
    import spark.implicits._
    // user 1: touch (view @1) lands in chunk 1, purchase @5 in chunk 2 —
    // attribution must bridge the trigger via stored state; the view @7
    // then supersedes for the purchase @8. user 2: click @4 and purchase
    // @6 straddle the same boundary. purchase @2 has no touch → dropped.
    Seq(
      (1L, 1L, "view", 10.0), (2L, 2L, "purchase", 99.0), (1L, 3L, "click", 0.0),
      (2L, 4L, "click", 0.0), (1L, 5L, "purchase", 25.5), (2L, 6L, "purchase", 12.25),
      (1L, 7L, "view", 0.0), (1L, 8L, "purchase", 7.0))
      .toDF("user_id", "event_id", "event_type", "value")
  }

  test("chunked fold == batch q24 rollup; cross-trigger touches bridged by state") {
    val work = Files.createTempDirectory("graft_sattr").toString
    val touches = new TxnLogState(s"$work/touches", spark, 4)
    StreamAttribution.applyBatch(touches, s"$work/agg", ev.filter(col("event_id") <= 4), 0L)
    StreamAttribution.applyBatch(touches, s"$work/agg",
      ev.filter(col("event_id") > 4 && col("event_id") <= 6), 1L)
    StreamAttribution.applyBatch(touches, s"$work/agg", ev.filter(col("event_id") > 6), 2L)
    val got = StreamAttribution.summary(spark, touches, s"$work/agg")
      .orderBy(col("touch")).collect().toSeq
    assert(got == batchRollup(ev), s"\ngot      $got\nexpected ${batchRollup(ev)}")
  }

  test("exact redelivery is skipped; out-of-order arrival fails loudly") {
    val work = Files.createTempDirectory("graft_sattr2").toString
    val touches = new TxnLogState(s"$work/touches", spark, 4)
    StreamAttribution.applyBatch(touches, s"$work/agg", ev.filter(col("event_id") <= 6), 0L)
    val before = StreamAttribution.summary(spark, touches, s"$work/agg")
      .orderBy(col("touch")).collect().toSeq
    StreamAttribution.applyBatch(touches, s"$work/agg", ev.filter(col("event_id") <= 6), 1L)
    val after = StreamAttribution.summary(spark, touches, s"$work/agg")
      .orderBy(col("touch")).collect().toSeq
    assert(after == before, "replayed batch must not double-count purchases")
    val ex = intercept[IllegalStateException] {
      StreamAttribution.applyBatch(touches, s"$work/agg", ev.filter(col("event_id") <= 3), 2L)
    }
    assert(ex.getMessage.contains("out-of-order"), ex.getMessage)
  }
}
