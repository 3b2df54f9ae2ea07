package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the nullability assumptions the query surface leans on. Dozens
  * of queries build synthetic corpora with `concat_ws` (null-SKIPPING)
  * while their DuckDB oracles use `||` (null-PROPAGATING) — the two
  * agree on every fixture precisely because these columns carry no
  * nulls. t38 hardened its own path by coalescing (ADVICE r17); for the
  * rest, this spec makes the shared assumption loud: if the fixture
  * generator ever starts emitting nulls here, fail HERE with a named
  * column, not as a mysterious oracle hash mismatch. */
class FixturesSpec extends SparkSpec {

  private def assertNoNulls(table: String, cols: Seq[String]): Unit = {
    val df = Fixtures.table(spark, sf0001, table)
    val counts = df.select(cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)): _*).head()
    cols.zipWithIndex.foreach { case (c, i) =>
      assert(counts.getLong(i) == 0L,
        s"$table.$c carries ${counts.getLong(i)} nulls — the concat_ws-vs-|| " +
          "oracle equivalence (and id routing) assumes none; coalesce at the " +
          "query sites before relying on a null-bearing fixture")
    }
  }

  test("documents: doc_id/text/lang/source non-null") {
    assertNoNulls("documents", Seq("doc_id", "text", "lang", "source"))
  }

  test("events: user_id/event_id/event_type/value non-null") {
    assertNoNulls("events", Seq("user_id", "event_id", "event_type", "value"))
  }

  test("embeddings: vec_id/embedding non-null") {
    assertNoNulls("embeddings", Seq("vec_id", "embedding"))
  }
}
