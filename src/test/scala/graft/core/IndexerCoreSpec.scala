package graft.core

import graft.SparkSpec
import graft.conf._
import graft.model.{Cell, MutationEvent}
import org.apache.spark.sql.functions._

/** Delete-calculus and dedup scenarios mirroring the reference's
  * RowBasedIndexerTest / ColumnBasedIndexerTest (hbase-indexer-engine
  * src/test: add, delete-column, delete-family, delete-row,
  * warn-skip when row/family fields are unconfigured, update+delete
  * ordering within one batch). */
class IndexerCoreSpec extends SparkSpec {

  private def events(evs: MutationEvent*) = {
    import spark.implicits._
    spark.createDataset(evs).toDF()
  }

  private def cell(q: String, v: String, t: String = "put") = Cell("cf", q, 0L, t, v)

  private val colConf = IndexerConf(
    table = "t", mappingType = MappingType.Column, rowReadMode = RowReadMode.Never,
    rowField = Some("row_s"), columnFamilyField = Some("cf_s"),
    fields = Seq(FieldDef("v_s", "cf:*", ValueSource.Value, "string")))

  test("column path dispatches the three delete types (F4)") {
    val out = IndexerCore.columnPath(colConf)(events(
      MutationEvent("t", "r1", 1, 0, Seq(cell("a", "x")), None),
      MutationEvent("t", "r2", 2, 0, Seq(cell("a", null, "delete-column")), None),
      MutationEvent("t", "r3", 3, 0, Seq(cell("", null, "delete-family")), None),
      MutationEvent("t", "r4", 4, 0, Seq(cell("", null, "delete-row")), None)))
      .select("kind", "id", "queryRow", "queryFamily")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      ("add", "r1-cf-a", null, null),
      ("deleteById", "r2-cf-a", null, null),
      ("deleteByQuery", "r3-cf-", "r3", "cf"),
      ("deleteByQuery", "r4-cf-", "r4", null)))
  }

  test("delete-family / delete-row warn-skip when row/family fields unconfigured") {
    val bare = colConf.copy(rowField = None, columnFamilyField = None)
    val out = IndexerCore.columnPath(bare)(events(
      MutationEvent("t", "r1", 1, 0, Seq(cell("a", "x")), None),
      MutationEvent("t", "r3", 3, 0, Seq(cell("", null, "delete-family")), None),
      MutationEvent("t", "r4", 4, 0, Seq(cell("", null, "delete-row")), None)))
      .select("kind").collect().map(_.getString(0)).toSeq
    // reference Indexer.java:404-410,420-426: without the metadata fields
    // the query deletes cannot be expressed — warn and skip
    assert(out == Seq("add"))
  }

  test("update then delete of the same cell within one batch: latest seq wins (A2)") {
    val out = IndexerCore.columnPath(colConf)(events(
      MutationEvent("t", "r1", 1, 0, Seq(cell("a", "old")), None),
      MutationEvent("t", "r1", 2, 0, Seq(cell("a", null, "delete-column")), None),
      MutationEvent("t", "r2", 1, 0, Seq(cell("a", null, "delete-column")), None),
      MutationEvent("t", "r2", 2, 0, Seq(cell("a", "new")), None)))
      .select("id", "kind").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("r1-cf-a" -> "deleteById", "r2-cf-a" -> "add"))
  }

  test("row path: out-of-order delivery is safe (T2 stronger than reference)") {
    val conf = IndexerConf(table = "t", rowReadMode = RowReadMode.Never,
      fields = Seq(FieldDef("v_s", "cf:*", ValueSource.Value, "string")))
    // deliver the later event first — seq-keyed max_by must still win
    val out = IndexerCore.rowPath(conf)(events(
      MutationEvent("t", "r1", 5, 0, Seq(cell("a", "latest")), None),
      MutationEvent("t", "r1", 1, 0, Seq(cell("a", "stale")), None)))
      .select(element_at(col("doc")("v_s"), 1)).collect().map(_.getString(0)).toSeq
    assert(out == Seq("latest"))
  }

  test("applyOps executes deleteByQuery against the injected row/family metadata") {
    import spark.implicits._
    val state = Seq(
      ("r1-cf-a", Map("v_s" -> Seq("x")), "r1", "cf"),
      ("r2-cf-a", Map("v_s" -> Seq("y")), "r2", "cf"))
      .toDF("id", "doc", "rowValue", "familyValue")
    val ops = Seq(("deleteByQuery", null: String,
        null: Map[String, Seq[String]], null: String, null: String, "r1", "cf"))
      .toDF("kind", "id", "doc", "rowValue", "familyValue", "queryRow", "queryFamily")
    val next = IndexerCore.applyOps(state, ops)
    assert(next.select("id").collect().map(_.getString(0)).toSeq == Seq("r2-cf-a"))
  }
}
