package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock A/B of the char-granular ExactSubstr operator under its two
  * hash kernels at bench scale — the d30 query shape (successor-concat
  * corpus from SPARK_GRAFT_SF_DIR) run with the oracle-replayable md5
  * kernel and with the O(len) rolling-polynomial kernel
  * ([[graft.expr.CharKgramHashesRolling]]). DedupSpec pins the two
  * frame-identical (micro-corpora + the sf0.01 fixture); this main puts a
  * measured WALL number on the petabyte-path kernel at the same scale the
  * bench records d30, so the "use rollingHash at 100 TB" claim in
  * SCALE.md carries a bench-scale datapoint, not just the single-thread
  * KernelProbe one. Same session shape as Bench (local[4], 4 shuffle
  * partitions, noop sink, warmup + median-of-3). */
object RollingD30Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val succ = d.select((col("doc_id") - 1).as("doc_id"), col("text").as("next_text"))
    val synth = d.join(succ, Seq("doc_id"))
      .select(col("doc_id"), concat_ws(" ", col("text"), col("next_text")).as("text"))

    def once(rolling: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.ops.Dedup.dedupCharSpans(synth, "doc_id", "text", k = 25,
          rollingHash = rolling)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median3(rolling: Boolean): Double = {
      once(rolling) // warmup (JIT + parquet footers)
      val ts = (1 to 3).map(_ => once(rolling)).sorted
      ts(1)
    }
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val md5 = median3(rolling = false)
    val roll = median3(rolling = true)
    println(s"""{"probe":"d30_rolling_vs_md5","sf":"$sfDir","md5_s":${r3(md5)},"rolling_s":${r3(roll)},"ratio":${r3(md5 / roll)}}""")
    spark.stop()
  }
}
