package graft.model

import org.apache.spark.sql.types._

/** Core data shapes of the engine, mirroring the reference's four data
  * shapes (see SURVEY.md §1.1):
  *
  *  - [[Cell]]      — reference: HBase KeyValue
  *                    (/root/reference hbase-sep-api .../SepEvent.java:30-80)
  *  - [[MutationEvent]] — reference: com.ngdata.sep.SepEvent
  *  - a row snapshot is a MutationEvent with only `put` cells
  *                    (reference RowData.java:20-49)
  *  - [[DocOp]]     — reference: SolrInputDocument + the two delete forms
  *                    (reference SolrUpdateCollector.java:40-98)
  *
  * Unlike the reference (row-at-a-time Java objects), these exist mostly as
  * *schemas*: the engine computes over DataFrames whose columns follow these
  * shapes, so Catalyst can prune/push/codegen. The case classes are used at
  * typed ingress/egress points and in tests.
  */
object CellType {
  val Put = "put"
  /** whole-row delete (HBase KeyValue.Type.Delete) */
  val DeleteRow = "delete-row"
  /** delete all cells of one family (KeyValue.Type.DeleteFamily) */
  val DeleteFamily = "delete-family"
  /** delete one column (KeyValue.Type.DeleteColumn) */
  val DeleteColumn = "delete-column"
  val all: Seq[String] = Seq(Put, DeleteRow, DeleteFamily, DeleteColumn)
}

/** One cell of a row mutation. `value` is an opaque byte payload in the
  * reference; we carry it as string-or-binary depending on the pipeline
  * (binary fidelity lives in graft.expr.HBaseCodecs).
  */
case class Cell(
    family: String,
    qualifier: String,
    ts: Long,
    cellType: String,
    value: String)

/** One atomic row mutation (reference SepEvent.java:30-80 plus `seq`,
  * the WAL arrival order needed for last-wins dedup — reference
  * Indexer.java:297-321 relies on HashMap insertion order for this).
  */
case class MutationEvent(
    table: String,
    rowKey: String,
    seq: Long,
    writeTime: Long,
    cells: Seq[Cell],
    payload: Option[String])

/** Output algebra: add / deleteById / deleteByQuery (reference
  * SolrUpdateCollector.java:40-98). `doc` is the dynamic field→values map;
  * deleteByQuery carries the (row, family) the reference encodes as a Solr
  * query (reference Indexer.java:361-427).
  */
case class DocOp(
    kind: String, // "add" | "deleteById" | "deleteByQuery"
    id: String,
    doc: Map[String, Seq[String]],
    queryRow: Option[String],
    queryFamily: Option[String])

object DocOp {
  val Add = "add"
  val DeleteById = "deleteById"
  val DeleteByQuery = "deleteByQuery"
}

object Schemas {
  val cell: StructType = StructType(Seq(
    StructField("family", StringType, nullable = false),
    StructField("qualifier", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("cellType", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))

  val mutationEvent: StructType = StructType(Seq(
    StructField("table", StringType, nullable = false),
    StructField("rowKey", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("writeTime", LongType, nullable = false),
    StructField("cells", ArrayType(cell), nullable = false),
    StructField("payload", StringType, nullable = true)))
}
