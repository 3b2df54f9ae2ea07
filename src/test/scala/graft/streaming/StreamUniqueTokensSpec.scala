package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** First-copy credit must resolve ACROSS triggers (a copy arriving in a
  * later trigger earns nothing), the composed fold must match the batch
  * min-doc_id rule, and the additive half's contract binds the whole:
  * redelivery skipped, out-of-order loud. */
class StreamUniqueTokensSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    // fp("a b") first ships from srcA (doc 1, trigger 1); srcB re-sends
    // it in trigger 2 (doc 4) — srcB must earn NO unique credit for it.
    // fp("c d e") is srcB's own (doc 3). doc 5 is srcA re-sending its
    // own content — stale for srcA too.
    Seq((1L, "srcA", "a b"), (2L, "srcA", "x y z"),
      (3L, "srcB", "c d e"), (4L, "srcB", " a  b "),
      (5L, "srcA", "x y z"))
      .toDF("doc_id", "source", "text")
  }

  test("cross-trigger first-copy credit == batch min-doc_id rule; replay/ooo contract") {
    val work = Files.createTempDirectory("graft_sut").toString
    val seen = new TxnLogState(s"$work/seen", spark, 4)
    StreamUniqueTokens.applyBatch(seen, s"$work/agg", docs.filter(col("doc_id") <= 2), 0L)
    StreamUniqueTokens.applyBatch(seen, s"$work/agg",
      docs.filter(col("doc_id") > 2 && col("doc_id") <= 4), 1L)
    StreamUniqueTokens.applyBatch(seen, s"$work/agg", docs.filter(col("doc_id") > 4), 2L)
    val got = StreamUniqueTokens.summary(spark, seen, s"$work/agg")
      .orderBy(col("source")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // srcA: raw 2+3+3=8, unique 2+3=5 (doc 5 is a re-send) → stale 375000
    assert(got("srcA") == ((8L, 5L, 375000L)), got.toString)
    // srcB: raw 3+2=5, unique 3 (the "a b" copy earns nothing) → 400000
    assert(got("srcB") == ((5L, 3L, 400000L)), got.toString)

    // bit-exact replay of the latest batch: a no-op
    StreamUniqueTokens.applyBatch(seen, s"$work/agg", docs.filter(col("doc_id") > 4), 3L)
    val after = StreamUniqueTokens.summary(spark, seen, s"$work/agg")
      .orderBy(col("source")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(after == got, "replayed batch must not double-count")

    val ex = intercept[IllegalStateException] {
      StreamUniqueTokens.applyBatch(seen, s"$work/agg", docs.filter(col("doc_id") <= 2), 4L)
    }
    assert(ex.getMessage.contains("out-of-order"), ex.getMessage)
  }
}
