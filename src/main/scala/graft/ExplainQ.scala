package graft
import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the optimized logical + formatted physical plan
  * for one named SparkEntry query (or times it with --time). Used to keep
  * every operator's plan honest — pushdowns present, no duplicated
  * expensive subtrees, whole-stage codegen spans wide. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).startsWith("--")) args(1) else "/root/testdata/sf0.01"
    val time = args.contains("--time")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // see Bench: reduce-side parallelism floor at fixture scale
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCED_PARTITION", "128k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println("=== optimized logical ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== physical (formatted) ===")
    df.explain("formatted")
    if (time) {
      // noop sink: full evaluation of every output column (count() would
      // let the optimizer prune the very work being measured)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[time] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      // the FINAL adaptive plan — runtime stage/exchange reuse only shows
      // here, never in the static explain above
      println("=== physical (final adaptive) ===")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
