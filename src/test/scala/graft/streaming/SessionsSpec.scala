package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The stateful-streaming sessionizer must agree exactly with the batch
  * window formulation (lag + running sum — ExtendedQueries s04) on the
  * same input. */
class SessionsSpec extends SparkSpec {

  private def batchSessions(events: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev", lag(col("ts_s"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts_s") - col("prev") > 3600, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_s")).as("start_s"), max(col("ts_s")).as("end_s"))
      .withColumn("dur_s", col("end_s") - col("start_s"))
  }

  test("flatMapGroupsWithState sessionizer == batch window sessionizer") {
    val events = graft.core.Fixtures.table(spark, sf0001, "events")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        expr("ts div 1000000000").as("ts_s"))
    val work = java.nio.file.Files.createTempDirectory("graft_sess").toString
    val cols = Seq("user_id", "sess_id", "n_events", "start_s", "end_s", "dur_s")
    val stream = StatefulSessions.sessionizeToCompletion(spark, events, work)
      .select(cols.map(col): _*).collect().toSet
    val batch = batchSessions(events)
      .select(cols.map(col): _*).collect().toSet
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("event-time timeout flushes an idle user's session — no sentinel anywhere") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val work = java.nio.file.Files.createTempDirectory("graft_sess_et").toString
    val logDir = s"$work/log"
    val outDir = s"$work/out"

    // three files = three micro-batches (maxFilesPerTrigger=1):
    //   1. user 1 has a 2-event session ending at t=1000
    //   2. user 2 events far past 1000+gap → watermark advances after this batch
    //   3. more user 2 activity → the NEXT batch evaluates timeouts against
    //      the post-batch-2 watermark, flushing user 1's idle session
    def writeFile(rows: (Long, Long, Long)*): Unit =
      rows.toSeq.toDF("user_id", "event_id", "ts_s")
        .coalesce(1).write.mode("append").parquet(logDir)
    writeFile((1L, 1L, 100L), (1L, 2L, 1000L))
    writeFile((2L, 3L, 50000L))
    writeFile((2L, 4L, 50010L))

    StatefulScope.withStatePartitions(spark, 2) {
      val src = spark.readStream
        .schema("user_id long, event_id long, ts_s long")
        .option("maxFilesPerTrigger", 1)
        .parquet(logDir)
      val q = StatefulSessions.sessionizeUnbounded(spark, src, gapSec = 3600L)
        .writeStream
        .format("parquet").option("path", outDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$work/ckpt")
        .start()
      q.awaitTermination()
    }

    val sessions = spark.read
      .schema("user_id long, sess_id long, n_events long, start_s long, end_s long, dur_s long")
      .parquet(outDir).as[StatefulSessions.Session].collect()
    val u1 = sessions.filter(_.user_id == 1L)
    assert(u1.toSeq == Seq(StatefulSessions.Session(1L, 1L, 2L, 100L, 1000L, 900L)),
      s"idle user 1 must flush by watermark timeout, got ${sessions.toSeq}")
    // user 2 is still active (watermark never passed its end+gap): open in
    // state, not in the output — exactly the unbounded-stream contract
    assert(!sessions.exists(_.user_id == 2L), s"user 2 must stay open, got ${sessions.toSeq}")
  }
}
