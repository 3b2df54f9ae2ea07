package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Cross-trigger singletons are the case that separates true counts
  * from per-trigger derivation: a term seen once in two triggers must
  * NOT report as a singleton. Plus the additive contract: redelivery
  * skipped, out-of-order loud. */
class StreamVocabSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    // "alpha" appears once in trigger 1 and once in trigger 2 — a
    // per-trigger singleton count would see two singletons; the true
    // count sees m=2 (not a singleton). "only" is a real singleton.
    Seq((1L, "a", "alpha beta"), (2L, "a", "beta gamma"),
      (3L, "a", "alpha only"), (4L, "b", "x y x"))
      .toDF("doc_id", "grp", "text")
  }

  test("chunked fold == batch missing mass; cross-trigger singletons resolved") {
    val expected = graft.ops.CorpusStats.missingMass(docs, "grp", "text")
      .orderBy(col("grp")).collect().toSeq
    val work = Files.createTempDirectory("graft_svocab").toString
    val state = new TxnLogState(s"$work/vocab", spark, 4)
    StreamVocab.applyBatch(state, docs.filter(col("doc_id") <= 2), 0L)
    StreamVocab.applyBatch(state, docs.filter(col("doc_id") > 2), 1L)
    val got = StreamVocab.summary(state).orderBy(col("grp")).collect().toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")
    // alpha must have folded to m=2: grp a's singletons are gamma and
    // only — NOT alpha (a per-trigger fold would report 3)
    val a = got.find(_.getString(0) == "a").get
    assert(a.getLong(3) == 2L, s"cross-trigger term must not count as singleton: $a")

    StreamVocab.applyBatch(state, docs.filter(col("doc_id") > 2), 2L)
    assert(StreamVocab.summary(state).orderBy(col("grp")).collect().toSeq == got,
      "replayed batch must not double-count")
    val ex = intercept[IllegalStateException] {
      StreamVocab.applyBatch(state, docs.filter(col("doc_id") <= 2), 3L)
    }
    assert(ex.getMessage.contains("out-of-order"), ex.getMessage)
  }

  test("degenerate batches: all-blank advances the hwm (fallback range path); empty is a no-op") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_svocab2").toString
    val state = new TxnLogState(s"$work/vocab", spark, 4)
    StreamVocab.applyBatch(state, docs.filter(col("doc_id") <= 2), 0L)
    val before = StreamVocab.summary(state).orderBy(col("grp")).collect().toSeq
    // all-blank batch: the census is empty (no terms), so (lo, hi) must
    // come from the fallback range job — and the hwm must still advance,
    // making a replay of THIS batch a detected redelivery
    val blanks = Seq((5L, "a", "   "), (6L, "b", "")).toDF("doc_id", "grp", "text")
    StreamVocab.applyBatch(state, blanks, 1L)
    assert(StreamVocab.summary(state).orderBy(col("grp")).collect().toSeq == before,
      "blank texts contribute no terms")
    StreamVocab.applyBatch(state, blanks, 2L) // bit-exact redelivery: skipped
    val ex = intercept[IllegalStateException] {
      // hwm DID advance past doc 6 — older ids must now fail loudly
      StreamVocab.applyBatch(state, docs.filter(col("doc_id") <= 2), 3L)
    }
    assert(ex.getMessage.contains("out-of-order"), ex.getMessage)
    // fully EMPTY batch: nothing arrives, nothing advances, no throw
    StreamVocab.applyBatch(state, docs.filter(col("doc_id") > 99), 4L)
    assert(StreamVocab.summary(state).orderBy(col("grp")).collect().toSeq == before)
  }
}
