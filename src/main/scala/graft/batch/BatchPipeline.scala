package graft.batch

import graft.conf.IndexerConf
import graft.core.IndexerCore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The batch path (reference hbase-indexer-mr, SURVEY §3.2): a pushed-down
  * snapshot scan through the same IndexerCore mapping calculus, then an
  * optional sharded index build.
  *
  * Scan options mirror the reference CLI (HBaseIndexingOptions.java:194-266):
  * row range (`--hbase-start-row/--hbase-end-row` → Scan.setStartRow/
  * setStopRow), time range (`--hbase-start-time/--hbase-end-time` →
  * Scan.setTimeRange). In Spark they are plain filters — Catalyst pushes
  * them into the parquet scan (`PushedFilters` in the physical plan; the
  * BatchPipelineSpec asserts this), and column projection prunes the read
  * schema the way the reference's familyMap trims the HBase scan.
  *
  * Row-read mode is forced to NEVER on this path, exactly as the reference
  * forces it in mappers (HBaseIndexerMapper.java:216-220): a scanned
  * snapshot row is already complete.
  */
case class ScanOptions(
    startRow: Option[String] = None, // inclusive
    stopRow: Option[String] = None, // exclusive (HBase Scan semantics)
    startTime: Option[Long] = None, // inclusive, cell/WAL time
    endTime: Option[Long] = None) // exclusive

object BatchPipeline {

  /** Apply the scan predicates — these reach the source as pushed filters. */
  def scan(snapshot: DataFrame, opts: ScanOptions): DataFrame = {
    val preds: Seq[Column] =
      opts.startRow.map(col("rowKey") >= _).toSeq ++
        opts.stopRow.map(col("rowKey") < _).toSeq ++
        opts.startTime.map(col("writeTime") >= _).toSeq ++
        opts.endTime.map(col("writeTime") < _).toSeq
    preds.foldLeft(snapshot)(_ filter _)
  }

  /** Scan → mapping core → doc ops. `snapshot` rows follow the engine's
    * mutation shape. Multi-table (regex) confs just see a unioned
    * snapshot — the table filter inside the core selects per conf. */
  def run(conf: IndexerConf, snapshot: DataFrame,
          opts: ScanOptions = ScanOptions()): DataFrame =
    IndexerCore.rowPath(conf.copy(rowReadMode = graft.conf.RowReadMode.Never))(
      scan(snapshot, opts))

  /** Dry run (reference IndexerDryRun): same plan, first `n` docs to the
    * driver instead of a sink. */
  def dryRun(conf: IndexerConf, snapshot: DataFrame,
             opts: ScanOptions = ScanOptions(), n: Int = 20): Seq[String] =
    run(conf, snapshot, opts).limit(n).collect().map(_.toString).toSeq

  /** S9/S10/S11 collapsed to their Spark shape: one shuffle on the shard
    * route (the reference's MR shuffle + SolrCloudPartitioner), then a
    * partitioned write — each `shard=N/` directory is an index segment
    * set. The reference's merge-tree (log_F(R/S) extra MR passes,
    * HBaseMapReduceIndexerTool.java:462-520) is unnecessary: the shuffle
    * already produces exactly `numShards` partitions, and AQE handles
    * within-shard file sizing.
    *
    * `router` picks the route function, mirroring the reference's two
    * modes (HBaseMapReduceIndexerTool.java:397-417):
    *   - `"md5"` — the engine-native HashSharder route (default, the
    *     reference's non-SolrCloud path);
    *   - `"solrcloud"` — Solr NRT-compatible compositeId/murmur3 range
    *     routing ([[graft.expr.SolrRouteHash]]), so an offline build
    *     dropped into a live SolrCloud collection puts every doc on the
    *     shard the NRT API would have picked — batch and live updates
    *     mix on identical unique keys. */
  def buildShards(ops: DataFrame, numShards: Int, outDir: String,
                  router: String = "md5"): Unit = {
    val route = router match {
      case "md5" => graft.expr.hfunctions.md5_shard(col("id"), numShards)
      case "solrcloud" => graft.expr.hfunctions.solr_shard(col("id"), numShards)
      case other => throw new IllegalArgumentException(
        s"unknown router '$other' (expected md5 or solrcloud)")
    }
    ops.filter(col("kind") === "add")
      .withColumn("shard", route)
      .repartition(numShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** Read a built shard set back (go-live's MergeIndexes becomes "point
    * the serving layer at the new directory"). */
  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** S12 go-live with validation: atomically repoint the serving layer at
    * a freshly built shard set, mirroring the reference's all-or-nothing
    * contract (GoLive.java:52-140 fails the WHOLE go-live if any shard
    * merge fails — a half-deployed index never serves). Pre-flip checks:
    * the build completed (`_SUCCESS`), at least one shard directory
    * exists, all shard ids are < `numShards`, and the total row count
    * matches `expectedRows` when given (the reference's analogue is the
    * per-shard merge RPC succeeding). Only after every check passes is
    * `serveDir/CURRENT` rewritten — the same pointer-flip commit as the
    * streaming IndexState; a failed validation throws and leaves the old
    * pointer (and thus the old live index) untouched. Returns the total
    * row count gone live. */
  def goLive(spark: SparkSession, shardsDir: String, serveDir: String,
             numShards: Int, expectedRows: Option[Long] = None): Long = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(shardsDir)
    require(Files.isDirectory(root), s"go-live: no shard build at $shardsDir")
    require(Files.exists(root.resolve("_SUCCESS")),
      s"go-live: build at $shardsDir is incomplete (no _SUCCESS marker)")
    val shardDirs = {
      val s = Files.list(root)
      try s.iterator().asScala.filter(p => p.getFileName.toString.startsWith("shard=")).toSeq
      finally s.close()
    }
    require(shardDirs.nonEmpty, s"go-live: no shard directories under $shardsDir")
    val ids = shardDirs.map(_.getFileName.toString.stripPrefix("shard=").toInt)
    require(ids.forall(k => k >= 0 && k < numShards),
      s"go-live: unexpected shard ids ${ids.filterNot(k => k >= 0 && k < numShards)} (numShards=$numShards)")
    shardDirs.foreach { d =>
      val s = Files.list(d)
      val hasData = try s.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
      finally s.close()
      require(hasData, s"go-live: shard directory $d has no data files")
    }
    val rows = spark.read.parquet(shardsDir).count()
    expectedRows.foreach(e => require(rows == e,
      s"go-live: shard build holds $rows rows, expected $e"))
    Files.createDirectories(Paths.get(serveDir))
    // temp-file + rename, not truncate-in-place: a reader resolving the
    // pointer mid-flip must see the old index or the new one, never an
    // empty path
    graft.streaming.IndexState.atomicWriteString(
      Paths.get(serveDir, "CURRENT"), root.toAbsolutePath.toString)
    rows
  }

  /** The currently served index (whatever go-live last validated). */
  def currentServing(spark: SparkSession, serveDir: String): Option[DataFrame] = {
    import java.nio.file.{Files, Paths}
    val ptr = Paths.get(serveDir, "CURRENT")
    if (Files.exists(ptr)) Some(spark.read.parquet(Files.readString(ptr).trim)) else None
  }
}
