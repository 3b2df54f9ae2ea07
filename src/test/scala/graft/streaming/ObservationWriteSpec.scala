package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import scala.concurrent.Await
import scala.concurrent.duration.Duration

/** Pins that write-command executions FULFILL Observations in this
  * Spark — the contract two streaming commit paths now lean on:
  *
  *  - [[IndexState.commitWithMeta]] rides its bucket census on the
  *    commit write (CollectMetrics directly in the write's child plan)
  *    and `get`s it right after — a regression hangs every commit;
  *  - [[StreamUniqueTokens.applyBatch]] rides its fresh-bucket census on
  *    the generation write THROUGH A CACHE (observe → cache; the write
  *    of a derived frame materializes the cache, executing the metrics
  *    node) — the shape an earlier round had measured as unfulfilled and
  *    worked around with an explicit collect; re-measured here, it
  *    fulfills, and the workaround job is retired.
  *
  * Both shapes are asserted with a bounded wait so a Spark upgrade that
  * stops fulfilling either fails here BY NAME instead of as a hung
  * commit. (The drain itself also guards its `get` with a timeout and a
  * restore-the-collect error message.) */
class ObservationWriteSpec extends SparkSpec {

  test("commit path: an Observation directly under the write's child plan fulfills") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_obsw").toString
    val obs = Observation()
    Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "v")
      .withColumn("_bucket", pmod(hash(col("id")), lit(4)))
      .observe(obs, collect_set(col("_bucket")).as("bs"))
      .repartition(col("_bucket"))
      .write.parquet(s"$dir/out")
    // IndexState.commitWithMeta calls get() here, which blocks forever if
    // write-command executions stop fulfilling observations — bound the
    // wait so a regression fails the suite instead of hanging it
    val row = Await.result(obs.future, Duration("60s"))
    assert(row.getAs[Seq[Int]]("bs").nonEmpty)
  }

  test("census path: an Observation under a cache is fulfilled by a derived write materializing it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_obsc").toString
    val obs = Observation()
    // the StreamUniqueTokens shape: observe → cache, first action on the
    // cached frame is a WRITE of a frame derived through joins/aggregates
    val b = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("id", "v")
      .observe(obs, min(col("v")).as("lo"), max(col("v")).as("hi"))
      .cache()
    try {
      b.groupBy(col("id")).agg(sum(col("v")).as("s")).write.parquet(s"$dir/out")
      val rm = Await.result(obs.future, Duration("60s"))
      assert(rm.getAs[Long]("lo") == 1L && rm.getAs[Long]("hi") == 3L)
    } finally { b.unpersist(blocking = false); () }
  }

  test("empty-branch carve-out: adaptive empty propagation yields a ZERO-FIELD row") {
    // when the observed frame turns out EMPTY at runtime, AQE's
    // empty-relation propagation eliminates the CollectMetrics node from
    // the executed plan and the future completes with Row.empty — NOT a
    // row of null/empty aggregates. StreamUniqueTokens relies on this
    // exact signature to route its empty-fresh fallback; if Spark starts
    // delivering a real (empty-aggregate) row here instead, that code's
    // row.length guard goes dead but stays correct — this test names the
    // behavior change.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_obse").toString
    val obs = Observation()
    val base = Seq(("a", 1L), ("b", 2L)).toDF("id", "v")
    // a self anti-join is empty at runtime but not provably at plan time
    val empty = base.join(base.select(col("id")), Seq("id"), "left_anti")
      .observe(obs, collect_set(col("id")).as("ids"))
      .cache()
    try {
      empty.groupBy(col("id")).agg(sum(col("v"))).write.parquet(s"$dir/out")
      val row = Await.result(obs.future, Duration("60s"))
      assert(row.length == 0,
        s"expected the eliminated-node zero-field row, got $row — Spark now " +
          "fulfills observations on adaptively-emptied branches; " +
          "StreamUniqueTokens's fallback guard can be retired")
    } finally { empty.unpersist(blocking = false); () }
  }
}
