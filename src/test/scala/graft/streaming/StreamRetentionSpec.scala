package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental retention fold must equal the batch cohort matrix
  * regardless of arrival order, and redelivery must be a no-op (the
  * state fold is min + set-union — commutative and idempotent). */
class StreamRetentionSpec extends SparkSpec {

  private def batchMatrix(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"), collect_set(col("day")).as("days"))
      .select(col("cohort"), explode(col("days")).as("day"))
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("offset_d"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("offset_d"))
      .collect().toSeq

  test("incremental fold == batch matrix under any arrival order; redelivery is a no-op") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L), (1L, 10L), (1L, 12L), (1L, 15L),
      (2L, 10L), (2L, 11L),
      (3L, 11L), (3L, 13L), (3L, 11L)).toDF("user_id", "day")
    val expected = batchMatrix(ev)

    val work = Files.createTempDirectory("graft_sret").toString
    val state = new TxnLogState(s"$work/state", spark, 4)
    // REVERSED-day arrival: later days land before the cohort day —
    // min/union does not care
    StreamRetention.applyBatch(state, ev.filter(col("day") >= 12), 0L)
    StreamRetention.applyBatch(state, ev.filter(col("day") < 12), 1L)
    // redeliver batch 1 verbatim (at-least-once replay)
    StreamRetention.applyBatch(state, ev.filter(col("day") < 12), 2L)
    val got = StreamRetention.summary(state)
      .orderBy(col("cohort"), col("offset_d")).collect().toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")
  }

  test("commit touches only the buckets the batch's users hash to") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_sret2").toString
    val state = new TxnLogState(s"$work/state", spark, 8)
    StreamRetention.applyBatch(state, Seq((42L, 5L)).toDF("user_id", "day"), 0L)
    // exactly one user → exactly one live bucket
    assert(state.liveBuckets.size == 1, state.liveBuckets.toString)
    val before = state.currentVersion
    // a batch for the SAME user must leave every other bucket's files alone
    StreamRetention.applyBatch(state, Seq((42L, 6L)).toDF("user_id", "day"), 1L)
    assert(state.liveBuckets.size == 1)
    assert(state.currentVersion != before)
  }
}
