package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** tokenBudget must equal the brute-force global greedy prefix for any
  * budget — including budgets that land exactly on a document boundary,
  * inside a tier, and beyond the corpus total. */
class SamplingSpec extends SparkSpec {

  test("tier-histogram selection == global-window greedy prefix across budgets") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // ~5% null quality: must sort LAST (selected only once every scored
    // doc is in), matching orderBy(q desc) nulls-last
    val docs = (1L to 400L).map { id =>
      val q: Option[Double] =
        if (rnd.nextInt(20) == 0) None
        else Some(math.floor(rnd.nextDouble() * 1000) / 1000.0)
      (id, q, 10L + rnd.nextInt(90))
    }.toDF("doc_id", "q", "n_tokens")

    val w = Window.partitionBy().orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = docs.withColumn("cum", sum(col("n_tokens")).over(w))
    val total = withCum.agg(max("cum")).collect()(0).getLong(0)
    val exactBoundary = withCum.filter(col("cum") <= total / 3)
      .agg(max("cum")).collect()(0).getLong(0)

    for (budget <- Seq(0L, 500L, exactBoundary, total / 2, total, total + 1000L)) {
      val expected = withCum.filter(col("cum") <= budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val got = Sampling.tokenBudget(docs, "doc_id", "q", "n_tokens", budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expected,
        s"budget=$budget: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("quotaSample: exact per-stratum counts, deterministic, quota-monotone") {
    import spark.implicits._
    val docs = (1L to 300L).map(id => (id, s"g${id % 3}")).toDF("doc_id", "g")
    // g0/g1/g2 have 100 docs each
    val quotas = Map("g0" -> 40L, "g1" -> 150L) // g1 quota exceeds size; g2 unlisted
    def run(q: Map[String, Long]) =
      Sampling.quotaSample(docs, "doc_id", "g", q)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val got = run(quotas)
    val byG = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byG == Map("g0" -> 40, "g1" -> 100, "g2" -> 100),
      s"exact min(quota, size) per stratum, got $byG")
    assert(run(quotas) == got, "hash-rank selection is deterministic")
    // smaller quota selects a strict prefix of the larger quota's picks
    val smaller = run(Map("g0" -> 10L, "g1" -> 150L))
    assert(smaller.filter(_._2 == "g0").subsetOf(got.filter(_._2 == "g0")),
      "rank-based quotas are monotone: quota 10 ⊂ quota 40")
  }
}
