package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("KmvBuffer: sorted-distinct bounded insert with displacement") {
    val b = new KmvBuffer(3)
    Seq(50L, 10L, 50L, 30L).foreach(b.insert) // dup 50 ignored
    assert(b.size == 3 && b.vals.take(3).toSeq == Seq(10L, 30L, 50L))
    b.insert(20L) // displaces 50
    assert(b.vals.take(3).toSeq == Seq(10L, 20L, 30L))
    b.insert(40L) // larger than max: no-op
    assert(b.vals.take(3).toSeq == Seq(10L, 20L, 30L))
    b.insert(10L) // dup of min: no-op
    assert(b.size == 3 && b.vals.take(3).toSeq == Seq(10L, 20L, 30L))
  }

  test("kmv_sketch aggregate: distinct k-minima across partitions; exact when under-full") {
    val df = spark.range(0, 1000).select((col("id") % 100).as("g"),
      ((col("id") * 7919L) % 500L).as("h")) // heavy duplication
    val full = df.select(lit(0L).as("g"), col("h"))
      .repartition(7) // force partial-merge paths
      .groupBy("g").agg(hfunctions.kmv_sketch(col("h"), 16).as("mins"))
      .select(explode(col("mins")).as("m")).as[Long].collect().toSeq
    // the 16 smallest distinct values of {(id*7919) % 500 : id < 1000}
    val expect = (0L until 1000L).map(i => (i * 7919L) % 500L).distinct.sorted.take(16)
    assert(full == expect)
    // under-full: a group with < k distinct values returns them all, sorted
    val small = Seq((1L, 5L), (1L, 3L), (1L, 5L), (1L, 9L)).toDF("g", "h")
      .groupBy("g").agg(hfunctions.kmv_sketch(col("h"), 16).as("mins"))
      .select(col("mins")).as[Seq[Long]].head()
    assert(small == Seq(3L, 5L, 9L))
  }

  test("kmv estimate: within 25% of the true distinct count on uniform 60-bit hashes") {
    val n = 20000
    val k = 256
    val hashed = spark.range(0, n)
      .select(graft.ops.Dedup.hash60(col("id").cast("string")).as("h"))
    val mins = hashed.select(lit(0L).as("g"), col("h"))
      .groupBy("g").agg(hfunctions.kmv_sketch(col("h"), k).as("mins"))
      .select(element_at(col("mins"), k)).as[Long].head()
    val est = (k - 1).toDouble * 1152921504606846976L.toDouble / mins.toDouble
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs true $n")
  }

  test("kmv plan: the exchange after the partial carries sketches, not hashes") {
    val df = spark.range(0, 100).select((col("id") % 4).as("g"), col("id").as("h"))
    val plan = df.groupBy("g").agg(hfunctions.kmv_sketch(col("h"), 8).as("m"))
      .queryExecution.executedPlan.toString
    // partial + final aggregate pair around a single exchange
    assert("Exchange".r.findAllIn(plan).length == 1, plan.take(800))
    assert(plan.contains("kmv_sketch"))
  }
}
