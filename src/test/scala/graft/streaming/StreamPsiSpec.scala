package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The drained histogram must equal the batch histogram however the
  * (ordered) stream chunks, so the summary equals the batch psiDrift;
  * replay must not double-fold; out-of-order must fail loudly. */
class StreamPsiSpec extends SparkSpec {

  private def cur = {
    import spark.implicits._
    Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 1L), (6L, 3L))
      .toDF("doc_id", "bin")
  }
  private def ref = {
    import spark.implicits._
    Seq(0L, 0L, 1L, 2L, 2L, 2L).toDF("bin")
  }

  test("chunked fold == batch psiDrift") {
    val work = Files.createTempDirectory("graft_spsi").toString
    StreamPsi.applyBatch(s"$work/state", cur.filter(col("doc_id") <= 2), 0L)
    StreamPsi.applyBatch(s"$work/state", cur.filter(col("doc_id") > 2 && col("doc_id") <= 4), 1L)
    StreamPsi.applyBatch(s"$work/state", cur.filter(col("doc_id") > 4), 2L)
    val got = StreamPsi.summary(spark, s"$work/state", ref)
      .orderBy(col("bin")).collect().toSeq
    val exp = graft.ops.CorpusStats.psiDrift(ref, cur.select("bin"), "bin")
      .orderBy(col("bin")).collect().toSeq
    assert(got == exp, s"\ngot $got\nexp $exp")
  }

  test("replay skipped, out-of-order fails") {
    val work = Files.createTempDirectory("graft_spsi2").toString
    StreamPsi.applyBatch(s"$work/state", cur.filter(col("doc_id") <= 4), 0L)
    StreamPsi.applyBatch(s"$work/state", cur.filter(col("doc_id") <= 4), 1L)
    val counts = spark.read.parquet(s"$work/state/g0")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 1L, 1L -> 2L, 2L -> 1L), counts.toString)
    val ex = intercept[IllegalStateException] {
      StreamPsi.applyBatch(s"$work/state", cur.filter(col("doc_id") === 3), 2L)
    }
    assert(ex.getMessage.contains("out-of-order"), ex.getMessage)
  }
}
