package graft.streaming

import graft.conf.IndexerConf
import graft.core.IndexerCore
import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.nio.file.{Files, Path, Paths}

/** The incremental path (reference SEP stream → Indexer → Solr) as
  * Structured Streaming (SURVEY §2.6):
  *
  *  - source: `readStream` over a file-backed mutation log — the engine's
  *    stand-in for the replication RPC ingress (SepConsumer.java:214-277);
  *  - subscription-timestamp filter at the ingress (T4);
  *  - per micro-batch: the same IndexerCore calculus as batch (the
  *    reference shares one core the same way), then an idempotent upsert
  *    into a parquet-backed index state (T1 at-least-once + idempotent
  *    sink = exactly-once state);
  *  - per-key ordering (T2/A6): the batch-wide `max_by(seq)` dedup makes
  *    out-of-order delivery safe — strictly stronger than the reference's
  *    thread-pinning, and it survives Spark's task retries.
  *
  * The index state lives as parquet under `indexDir/current`; each batch
  * writes a new versioned snapshot directory and flips a pointer file —
  * the same copy-on-write move that table formats make at scale (at 100 TB
  * you'd swap this sink for Delta/Iceberg MERGE; the op algebra is
  * identical).
  */
class IndexState(val indexDir: String, spark: SparkSession) extends Serializable {
  private val ptr: Path = Paths.get(indexDir, "CURRENT")
  Files.createDirectories(Paths.get(indexDir))

  def currentVersion: Option[String] =
    if (Files.exists(ptr)) Some(Files.readString(ptr).trim) else None

  def read(): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(s"$indexDir/$v"))

  /** copy-on-write commit: write a full new snapshot, then flip CURRENT */
  def commit(newState: DataFrame, version: String): Unit = {
    newState.write.mode("overwrite").parquet(s"$indexDir/$version")
    Files.writeString(ptr, version)
  }
}

object MutationStream {

  /** Open the file-backed mutation log as a stream. */
  def source(spark: SparkSession, logDir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(Schemas.mutationEvent)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(logDir)

  /** Document fields the sink needs for deleteByQuery — the reference
    * injects row/family fields into each doc for exactly this reason
    * (SURVEY §7.4 hard-part 2). */
  private def opsWithSinkMeta(conf: IndexerConf, ops: DataFrame): DataFrame =
    ops.select(
      col("kind"), col("id"), col("doc"),
      col("rowKey").as("rowValue"),
      lit(null).cast("string").as("familyValue"),
      lit(null).cast("string").as("queryRow"),
      lit(null).cast("string").as("queryFamily"))

  /** Start the indexer stream: mutation log → IndexerCore row path →
    * idempotent upsert into the parquet index state. Returns the running
    * query; stop via `.stop()` (pause = keep checkpoint, rewind = delete
    * checkpoint — reference T5). */
  def start(
      spark: SparkSession,
      conf: IndexerConf,
      logDir: String,
      indexDir: String,
      checkpointDir: String,
      subscriptionTs: Long = 0L,
      snapshot: Option[DataFrame] = None): StreamingQuery = {

    val state = new IndexState(indexDir, spark)

    source(spark, logDir)
      // A7: engine-native meters (reference IndexingEventListener.java:62-67)
      // — per-batch ingress counts surface in StreamingQueryProgress
      // .observedMetrics under "graft.ingress"
      .observe("graft.ingress", count(lit(1)).as("events"),
        count(when(col("writeTime") >= lit(subscriptionTs), 1)).as("applicable"))
      .transform(IndexerCore.subscriptionFilter(subscriptionTs))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ops = opsWithSinkMeta(conf, IndexerCore.rowPath(conf, snapshot)(batch))
        val prev = state.read().getOrElse {
          val empty = spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ops.schema)
          empty.select(col("id"), col("doc"), col("rowValue"), col("familyValue"))
        }
        val next = IndexerCore.applyOps(
          prev.select("id", "doc", "rowValue", "familyValue"), ops)
        // batchId in the version makes the commit idempotent under retry
        state.commit(next, f"v$batchId%09d")
        ()
      }
      .start()
  }

  /** Drain the log and return the final index state (wait-until-drained —
    * reference ReplicationWaitCli semantics, T6). */
  def runToCompletion(
      spark: SparkSession,
      conf: IndexerConf,
      logDir: String,
      workDir: String,
      subscriptionTs: Long = 0L,
      snapshot: Option[DataFrame] = None): DataFrame = {
    val q = start(spark, conf, logDir, s"$workDir/index", s"$workDir/ckpt",
      subscriptionTs, snapshot)
    q.awaitTermination()
    new IndexState(s"$workDir/index", spark).read().getOrElse(
      spark.emptyDataFrame)
  }
}
