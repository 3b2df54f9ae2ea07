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
    val events = spark.read.parquet(s"$sf0001/events.parquet")
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
}
