package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental snapshot diff must equal the batch fuzzy triage
  * however the re-crawl is chunked, redelivery must fold idempotently,
  * and a different-content re-arrival must fail loudly (snapshot
  * contract), never silently re-verdict. */
class StreamSnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  private val v1 = Seq(
    1L -> "the quick brown fox jumps over the lazy dog today",
    2L -> "spark shuffles partition data across the cluster by key",
    3L -> "a completely different document about gardening tools",
    4L -> "this one will be deleted from the next crawl entirely",
    5L -> "short doc").toDF("doc_id", "text")

  // 1 unchanged (formatting churn), 2 minor edit, 3 rewrite (reversed),
  // 4 deleted, 5 too-short changed → rewrite, 9 added
  private val v2 = Seq(
    1L -> "  the quick brown fox jumps over the lazy dog today ",
    2L -> "spark shuffles partition data across the cluster by key ok",
    3L -> "tools gardening about document different completely a",
    5L -> "doc short",
    9L -> "a brand new page that was not in the standing corpus").toDF("doc_id", "text")

  private def stores() = {
    val work = Files.createTempDirectory("graft_sdiff").toString
    (new TxnLogState(s"$work/base", spark, 8), new TxnLogState(s"$work/verd", spark, 8))
  }

  test("chunked applyBatch == batch snapshotFuzzyDiff, any chunking") {
    val expected = Dedup.snapshotFuzzyDiff(v1, v2, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    for (chunks <- Seq(
        Seq(v2),                                                  // one batch
        Seq(v2.filter(col("doc_id") <= 3), v2.filter(col("doc_id") > 3)),
        Seq(v2.filter(col("doc_id") % 2 === 1), v2.filter(col("doc_id") % 2 === 0)))) {
      val (base, verd) = stores()
      StreamSnapshotDiff.initBaseline(base, v1, "doc_id", "text")
      chunks.zipWithIndex.foreach { case (c, i) =>
        StreamSnapshotDiff.applyBatch(base, verd, c, i.toLong, "doc_id", "text")
      }
      val got = StreamSnapshotDiff.summary(base, verd)
        .orderBy("doc_id").collect().toSeq
      assert(got == expected, s"chunking ${chunks.size} diverged: $got")
    }
  }

  test("bit-exact redelivery is skipped; different content fails loudly") {
    val (base, verd) = stores()
    StreamSnapshotDiff.initBaseline(base, v1, "doc_id", "text")
    StreamSnapshotDiff.applyBatch(base, verd, v2, 0L, "doc_id", "text")
    val once = StreamSnapshotDiff.summary(base, verd).orderBy("doc_id").collect().toSeq
    // redelivered batch folds to the identical state
    StreamSnapshotDiff.applyBatch(base, verd, v2, 1L, "doc_id", "text")
    assert(StreamSnapshotDiff.summary(base, verd).orderBy("doc_id").collect().toSeq == once)
    // the same id with DIFFERENT content breaks the snapshot contract
    val bad = Seq(1L -> "now it claims to say something else").toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamSnapshotDiff.applyBatch(base, verd, bad, 2L, "doc_id", "text")
    }
    assert(e.getMessage.contains("snapshot contract"), e.getMessage)
    // and so does a twice-in-one-batch id with two versions
    val (base2, verd2) = stores()
    StreamSnapshotDiff.initBaseline(base2, v1, "doc_id", "text")
    val twin = Seq(1L -> "version a", 1L -> "version b").toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      StreamSnapshotDiff.applyBatch(base2, verd2, twin, 0L, "doc_id", "text")
    }
    assert(e2.getMessage.contains("snapshot contract"), e2.getMessage)
  }

  test("deleted is only decidable at drain end: grows then shrinks as docs arrive") {
    val (base, verd) = stores()
    StreamSnapshotDiff.initBaseline(base, v1, "doc_id", "text")
    StreamSnapshotDiff.applyBatch(base, verd,
      v2.filter(col("doc_id") === 1), 0L, "doc_id", "text")
    val mid = StreamSnapshotDiff.summary(base, verd)
      .filter(col("status") === "deleted").count()
    assert(mid == 4, s"after one doc, 4 baseline ids look deleted, got $mid")
    StreamSnapshotDiff.applyBatch(base, verd,
      v2.filter(col("doc_id") =!= 1), 1L, "doc_id", "text")
    val fin = StreamSnapshotDiff.summary(base, verd)
      .filter(col("status") === "deleted").collect().map(_.getLong(0)).toSeq
    assert(fin == Seq(4L), s"only doc 4 is truly deleted, got $fin")
  }
}
