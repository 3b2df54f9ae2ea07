package graft.batch

import graft.SparkSpec
import graft.conf.{FieldDef, IndexerConf, RowReadMode, ValueSource}
import graft.core.Fixtures
import org.apache.spark.sql.functions._

/** Batch path: scan predicates must PUSH DOWN to the parquet source (the
  * Spark equivalent of Scan.setStartRow/setTimeRange reaching HBase), and
  * the pipeline must produce the same docs as an unpushed filter. */
class BatchPipelineSpec extends SparkSpec {

  private val conf = IndexerConf(
    table = "customer", rowReadMode = RowReadMode.Never,
    fields = Seq(FieldDef("name_s", "info:name", ValueSource.Value, "string")))

  test("row-range and time-range predicates reach the parquet scan (PushedFilters)") {
    val work = java.nio.file.Files.createTempDirectory("graft_batch").toString
    Fixtures.customerCells(spark, sf0001).write.mode("overwrite").parquet(s"$work/snap")
    val snap = spark.read.parquet(s"$work/snap")
    val scanned = BatchPipeline.scan(snap,
      ScanOptions(startRow = Some("2"), stopRow = Some("5"), startTime = Some(0L)))
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("GreaterThanOrEqual(rowKey,2"), "start-row filter must be pushed:\n" + plan.take(800))
    assert(plan.contains("LessThan(rowKey,5"), "stop-row filter must be pushed:\n" + plan.take(800))
  }

  test("scan options bound the run; dry-run returns docs without a sink") {
    val events = Fixtures.customerCells(spark, sf0001)
    val all = BatchPipeline.run(conf, events).count()
    val bounded = BatchPipeline.run(conf, events,
      ScanOptions(startRow = Some("10"), stopRow = Some("2"))).count() // lexicographic range
    assert(bounded < all && bounded > 0)
    val dry = BatchPipeline.dryRun(conf, events, n = 5)
    assert(dry.size == 5)
  }

  test("shard build writes numShards partitions and round-trips") {
    val work = java.nio.file.Files.createTempDirectory("graft_batch2").toString
    val ops = BatchPipeline.run(conf, Fixtures.customerCells(spark, sf0001))
    BatchPipeline.buildShards(ops.select("kind", "id", "doc"), 4, s"$work/shards")
    val back = BatchPipeline.readShards(spark, s"$work/shards")
    assert(back.select("shard").distinct().count() == 4)
    assert(back.count() == ops.filter(col("kind") === "add").count())
    // routing matches the md5 sharder expression
    val mismatch = back.withColumn("expect",
        graft.expr.hfunctions.md5_shard(col("id"), 4))
      .filter(col("shard") =!= col("expect")).count()
    assert(mismatch == 0)
  }

  test("go-live validates before the pointer flip; failure leaves the old pointer") {
    import java.nio.file.{Files, Paths}
    val work = java.nio.file.Files.createTempDirectory("graft_golive").toString
    val ops = BatchPipeline.run(conf, Fixtures.customerCells(spark, sf0001))
    val nAdds = ops.filter(col("kind") === "add").count()
    BatchPipeline.buildShards(ops.select("kind", "id", "doc"), 4, s"$work/v1")
    val serve = s"$work/serve"

    // happy path: validation passes, CURRENT points at v1
    assert(BatchPipeline.goLive(spark, s"$work/v1", serve, 4, Some(nAdds)) == nAdds)
    assert(BatchPipeline.currentServing(spark, serve).get.count() == nAdds)
    val livePtr = Files.readString(Paths.get(serve, "CURRENT"))

    // row-count mismatch → throws, pointer untouched
    BatchPipeline.buildShards(ops.select("kind", "id", "doc").limit(3), 4, s"$work/v2")
    intercept[IllegalArgumentException] {
      BatchPipeline.goLive(spark, s"$work/v2", serve, 4, Some(nAdds))
    }
    assert(Files.readString(Paths.get(serve, "CURRENT")) == livePtr)

    // incomplete build (no _SUCCESS) → throws, pointer untouched
    Files.delete(Paths.get(s"$work/v2", "_SUCCESS"))
    intercept[IllegalArgumentException] {
      BatchPipeline.goLive(spark, s"$work/v2", serve, 4)
    }
    assert(Files.readString(Paths.get(serve, "CURRENT")) == livePtr)
    assert(BatchPipeline.currentServing(spark, serve).get.count() == nAdds,
      "old index still serves after failed go-lives")
  }
}
