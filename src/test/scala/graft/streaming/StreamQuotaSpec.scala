package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** First-come admission across triggers must equal the batch rank
  * prefix however the (ordered) stream chunks; exact redelivery must
  * not re-admit; out-of-order arrival must fail loudly. */
class StreamQuotaSpec extends SparkSpec {

  private val quotas = Map("a" -> 3L, "b" -> 1L)

  private def d = {
    import spark.implicits._
    // class a: 5 arrivals (quota 3 exhausts inside chunk 2);
    // class b: quota 1 exhausts in chunk 1; class c: unlisted → nothing
    Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"),
        (5L, "a"), (6L, "b"), (7L, "a"), (8L, "a")).toDF("doc_id", "cls")
  }

  private def admitted(outPath: String) =
    spark.read.parquet(outPath)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("chunked admission == per-class rank prefix; counters span triggers") {
    val work = Files.createTempDirectory("graft_sq").toString
    StreamQuota.applyBatch(s"$work/state", quotas, d.filter(col("doc_id") <= 3), s"$work/out", 0L)
    StreamQuota.applyBatch(s"$work/state", quotas, d.filter(col("doc_id") > 3 && col("doc_id") <= 6), s"$work/out", 1L)
    StreamQuota.applyBatch(s"$work/state", quotas, d.filter(col("doc_id") > 6), s"$work/out", 2L)
    assert(admitted(s"$work/out") ==
      Set((1L, "a", 1L), (2L, "b", 1L), (3L, "a", 2L), (5L, "a", 3L)))
  }

  test("exact redelivery skipped; out-of-order fails; empty batch is a no-op") {
    val work = Files.createTempDirectory("graft_sq2").toString
    StreamQuota.applyBatch(s"$work/state", quotas, d.filter(col("doc_id") <= 3), s"$work/out", 0L)
    val before = admitted(s"$work/out")
    StreamQuota.applyBatch(s"$work/state", quotas, d.filter(col("doc_id") <= 3), s"$work/out", 1L)
    assert(admitted(s"$work/out") == before, "replay must not re-admit")
    StreamQuota.applyBatch(s"$work/state", quotas, d.limit(0), s"$work/out", 2L)
    assert(admitted(s"$work/out") == before)
    val ex = intercept[IllegalStateException] {
      StreamQuota.applyBatch(s"$work/state", quotas, d.filter(col("doc_id") === 2), s"$work/out", 3L)
    }
    assert(ex.getMessage.contains("out-of-order"), ex.getMessage)
  }

  test("cluster gate: chunked embedding admission == one-shot (delegation preserves counters)") {
    import java.nio.file.Files
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val corpus = graft.ops.Similarity.prep(emb, "vec_id", "embedding")
    val cents = graft.ops.Similarity.trainCentroids(corpus, 4)
    val quotas = (0L until 4L).map(c => c.toString -> 30L).toMap
    def admitted(out: String) = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq

    val w1 = Files.createTempDirectory("graft_scq1").toString
    graft.streaming.StreamClusterQuota.applyBatch(emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", cents, quotas, s"$w1/state", s"$w1/out", 0L)
    graft.streaming.StreamClusterQuota.applyBatch(emb.filter(col("vec_id") >= 100),
      "vec_id", "embedding", cents, quotas, s"$w1/state", s"$w1/out", 1L)

    val w2 = Files.createTempDirectory("graft_scq2").toString
    graft.streaming.StreamClusterQuota.applyBatch(emb,
      "vec_id", "embedding", cents, quotas, s"$w2/state", s"$w2/out", 0L)

    val chunked = admitted(s"$w1/out")
    assert(chunked == admitted(s"$w2/out"), "chunking must not change admissions")
    assert(chunked.nonEmpty && chunked.groupBy(_._2).values.forall(_.size <= 30))
  }
}
