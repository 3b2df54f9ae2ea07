package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the bounded-graph cutover boundary (SCALE.md §"Bounded-graph
  * loops"): the driver-local fast path just below `localEdgeThreshold`
  * vs the distributed loop just above it — AND both paths forced at BOTH
  * sizes on the same q26-shaped synthetic graph family, so the SCALE
  * table compares like-for-like and the 1M default is a measured choice,
  * not a guess. Also checksums the two paths against each other (they
  * are bit-identical by construction — integer fixed-point grids).
  *
  * Usage: runMain graft.GraphThresholdProbe [edgesLow edgesHigh]
  * (defaults 900000 1200000; vertices fixed at 50k so only the EDGE
  * bound decides the path). Prints one JSON line per cell. */
object GraphThresholdProbe {

  def main(args: Array[String]): Unit = {
    val eLow = args.headOption.map(_.toLong).getOrElse(900000L)
    val eHigh = args.drop(1).headOption.map(_.toLong).getOrElse(1200000L)
    val v = 50000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // q26-shaped synthetic: multiplicative-hash endpoints spread mass
    // like the session-sequence bigraph; parallel edges allowed (pageRank
    // treats them as added weight, same as q26's pre-aggregated counts)
    def mkEdges(n: Long) = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(v)).as("src"),
      pmod(col("id") * 40503L + 7L, lit(v)).as("dst"),
      (col("id") % 3 + 1).as("w"))
      .filter(col("src") =!= col("dst"))
    val nodes = spark.range(v).select(col("id").as("item"))

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(expr("pr_q * (item % 97 + 1)"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    def timed(nEdges: Long, forceLocal: Boolean): (Double, (Long, Long)) = {
      val thr = if (forceLocal) Long.MaxValue else 0L
      val vThr = if (forceLocal) Long.MaxValue else 0L
      // fresh edges each rep — localCheckpoint blocks are dropped below
      val runs = (1 to 3).map { _ =>
        val edges = mkEdges(nEdges)
        val t0 = System.nanoTime()
        val out = graft.ops.Relational.pageRank(edges, nodes, 10,
          localEdgeThreshold = thr, localVertexThreshold = vThr)
        val cs = checksum(out)
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        (sec, cs)
      }
      (runs.map(_._1).sorted.apply(1), runs.head._2)
    }

    for (n <- Seq(eLow, eHigh)) {
      val (localSec, localCs) = timed(n, forceLocal = true)
      val (distSec, distCs) = timed(n, forceLocal = false)
      require(localCs == distCs,
        s"paths diverged at $n edges: local=$localCs dist=$distCs")
      println(s"""{"edges":$n,"vertices":$v,"local_sec":${math.round(localSec * 100) / 100.0},""" +
        s""""dist_sec":${math.round(distSec * 100) / 100.0},"checksum":"${distCs._1}/${distCs._2}"}""")
    }
    spark.stop()
  }
}
