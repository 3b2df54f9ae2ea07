package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SRP-bucketed near-dup operator must be a drop-in for the exact
  * cross join on the fixture: every pair ≥ threshold recovered (recall
  * 1.0 — precision is structural, candidates are exact-verified), with no
  * cartesian product anywhere in the plan. */
class SimilaritySpec extends SparkSpec {

  private lazy val corpus =
    Similarity.prep(spark.read.parquet(s"$sf0001/embeddings.parquet"), "vec_id", "embedding")

  test("bucketed near-dup pairs == exact cross-join pairs at threshold 0.4") {
    val exact = Similarity.cosineNearDupPairsExact(corpus, 0.4)
      .orderBy("a_id", "b_id").collect().toSeq
    val bucketed = Similarity.cosineNearDupPairs(corpus, 0.4, dim = 64)
      .orderBy("a_id", "b_id").collect().toSeq
    assert(exact.nonEmpty, "fixture must contain near-dup pairs")
    assert(bucketed == exact)
  }

  test("bucketed near-dup plan has no cartesian product") {
    val plan = Similarity.cosineNearDupPairs(corpus, 0.4, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("bruteForceTopK: bounded-heap aggregate == window row_number, no Window in plan") {
    import org.apache.spark.sql.expressions.Window
    val queries = corpus.filter(col("vec_id") < 7)
    val got = Similarity.bruteForceTopK(corpus, queries, 5)
      .orderBy("q_id", "rk").collect().toSeq

    val q = queries.select(col("vec_id").as("q_id"), col("q").as("q_vec"), col("nq").as("q_nq"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", Similarity.cosineq(col("q"), col("q_vec"), col("nq"), col("q_nq")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id").asc)
    val expected = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("n_id"), col("sim"), col("rk").cast("long").as("rk"))
      .orderBy("q_id", "rk").collect().toSeq
    assert(got == expected)

    val plan = Similarity.bruteForceTopK(corpus, queries, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "top-k must not shuffle all scored pairs into a window")
    assert(plan.contains("partial_topk_by"), "map-side partial aggregation expected:\n" + plan.take(900))
  }

  test("compiled srpBucketFast == higher-order-function srpBucket (a02's oracle contract)") {
    val rows = corpus.limit(50)
      .select(Similarity.srpBucket(col("q"), 8).as("hof"),
        Similarity.srpBucketFast(col("q"), 8, 64).as("fast"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("plane coefficients match the md5-derived planeCoef expression") {
    val viaExpr = spark.range(1).select(
      (0 until 4).flatMap(p => (0 until 3).map(d =>
        Similarity.planeCoef(lit(p), lit(d)).as(s"c_${p}_$d"))): _*).collect().head
    val viaScala = for (p <- 0 until 4; d <- 0 until 3) yield Similarity.planeCoefs(p, 3)(d)
    assert(viaScala == (0 until 12).map(i => viaExpr.getLong(i)))
  }
}
