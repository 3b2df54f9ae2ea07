package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop sink: forces full evaluation of every output column — count()
    // would let the optimizer prune projection-only work and under-report
    def run(name: String): Option[String] =
      try {
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        None
      } catch {
        case t: Throwable => Some(t.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(200))
      }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // one full untimed pass first: JIT/codegen-cache/parquet-footer costs
    // land here, so ~1s run-order noise can't masquerade as a regression
    // on the sub-second shuffle-free queries
    if (warmup) names.foreach(run)

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val err = run(name)
      val secs = (System.nanoTime() - t0) / 1e9
      // a failed query must be distinguishable from a fast one: -1 marker
      err.foreach(errors.put(name, _))
      name -> (if (err.isEmpty) secs else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
