package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental stage-first fold must equal the batch funnel under
  * any arrival order, and redelivery must be a no-op (per-field min is
  * commutative and idempotent). */
class StreamFunnelSpec extends SparkSpec {

  test("incremental fold == batch funnel under reversed arrival; redelivery is a no-op") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"), // full funnel
      (2L, 4L, "view"), (2L, 5L, "click"),                        // view→click
      (3L, 6L, "click"), (3L, 7L, "view"),                        // click BEFORE view
      (4L, 8L, "view")).toDF("user_id", "event_id", "event_type")
    val expected = ev.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("event_id"))).as("f_view"),
        min(when(col("event_type") === "click", col("event_id"))).as("f_click"),
        min(when(col("event_type") === "purchase", col("event_id"))).as("f_buy"))
      .agg(count(col("f_view")).as("n_view"),
        count(when(col("f_view") < col("f_click"), 1)).as("n_view_click"),
        count(when(col("f_view") < col("f_click") && col("f_click") < col("f_buy"), 1))
          .as("n_full_funnel"))
      .collect().toSeq

    val work = Files.createTempDirectory("graft_sfun").toString
    val state = new TxnLogState(s"$work/state", spark, 4)
    // reversed event order across batches — min-fold does not care
    StreamFunnel.applyBatch(state, ev.filter(col("event_id") > 4), 0L)
    StreamFunnel.applyBatch(state, ev.filter(col("event_id") <= 4), 1L)
    StreamFunnel.applyBatch(state, ev.filter(col("event_id") <= 4), 2L) // replay
    val got = StreamFunnel.summary(state).collect().toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")
    // sanity on the fixture: 4 viewers, 2 view→click, 1 full funnel
    assert(got.head.getLong(0) == 4L && got.head.getLong(1) == 2L && got.head.getLong(2) == 1L)
  }
}
