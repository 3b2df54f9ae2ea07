package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental bucket fold must equal the batch burst census however
  * the (ordered) stream chunks arrivals; exact redelivery must be
  * skipped; out-of-order arrival must fail loudly. */
class StreamBurstSpec extends SparkSpec {

  private def ev = {
    import spark.implicits._
    // type A: 10 in hour 0 split ACROSS two triggers + 1 each in hours
    // 1, 2 → hour-0 burst only counts right if the fold bridges triggers
    ((1L to 10L).map(i => (i, "A", 100L + i)) ++
      Seq((11L, "A", 3700L), (12L, "A", 7300L),
        (13L, "B", 100L), (14L, "B", 3700L)))
      .toDF("event_id", "event_type", "ts_s")
  }

  test("chunked fold == batch census; redelivery skipped; out-of-order throws") {
    val expected = graft.ops.Relational.burstCensus(ev, "event_type", "ts_s")
      .orderBy(col("event_type"), col("bucket")).collect().toSeq
    assert(expected.nonEmpty, "fixture must contain a burst")

    val work = Files.createTempDirectory("graft_sburst").toString
    StreamBurst.applyBatch(s"$work/agg", ev.filter(col("event_id") <= 5), 0L)
    StreamBurst.applyBatch(s"$work/agg",
      ev.filter(col("event_id") > 5 && col("event_id") <= 10), 1L)
    StreamBurst.applyBatch(s"$work/agg", ev.filter(col("event_id") > 10), 2L)
    val got = StreamBurst.summary(spark, s"$work/agg")
      .orderBy(col("event_type"), col("bucket")).collect().toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")

    StreamBurst.applyBatch(s"$work/agg", ev.filter(col("event_id") > 10), 3L)
    val after = StreamBurst.summary(spark, s"$work/agg")
      .orderBy(col("event_type"), col("bucket")).collect().toSeq
    assert(after == got, "replayed batch must not double-count buckets")

    val ex = intercept[IllegalStateException] {
      StreamBurst.applyBatch(s"$work/agg", ev.filter(col("event_id") <= 5), 4L)
    }
    assert(ex.getMessage.contains("out-of-order"), ex.getMessage)
  }
}
