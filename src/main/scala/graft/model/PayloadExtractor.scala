package graft.model

import org.apache.spark.sql.{DataFrame, Encoders}

/** P16's pluggable half: the reference lets the ingress accept a custom
  * payload-extractor CLASS that derives each event's payload blob from
  * the mutation's own cells (reference
  * hbase-sep/hbase-sep-api/src/main/java/com/ngdata/sep/PayloadExtractor.java:21-36,
  * wired per-consumer in SepConsumer.java:246-253). A cell either
  * yields payload bytes or nothing; per row the FIRST extracted payload
  * wins (SepConsumer logs and drops later ones).
  *
  * This is the EVENT-level plug-in at the ingress; its siblings are the
  * value-level [[graft.mapping.ValueMapper]] (P5) and the record-level
  * [[graft.core.RecordMapper]] (P17) — same reflective-load seam. */
trait PayloadExtractor extends Serializable {
  /** The payload carried by one cell of a `table` mutation, or None. */
  def extractPayload(table: String, cell: Cell): Option[String]
}

/** The reference's stock extractor (BasePayloadExtractor.java:30-77):
  * exact (table, family, qualifier) match returns the cell value. */
class BasePayloadExtractor(table: String, family: String, qualifier: String)
    extends PayloadExtractor {
  override def extractPayload(t: String, c: Cell): Option[String] =
    if (t == table && c.family == family && c.qualifier == qualifier)
      Option(c.value)
    else None
}

/** Demo plug-in (the tests' and queries' stand-in for a user class):
  * any table, payload rides in the `sys:payload` cell. */
class SysPayloadExtractor extends PayloadExtractor {
  override def extractPayload(t: String, c: Cell): Option[String] =
    if (c.family == "sys" && c.qualifier == "payload") Option(c.value) else None
}

object PayloadExtractor {

  /** Reflective load by class name — unknown classes fail at wiring
    * time, not per row (the [[graft.mapping.ValueMapper.load]]
    * convention). */
  def load(className: String): PayloadExtractor =
    try Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[PayloadExtractor]
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"$className is not a loadable PayloadExtractor", e)
    }

  /** Apply an extractor at the ingress: rewrite each event's `payload`
    * to the first payload any of its cells yields (cell order — the
    * SepConsumer.java:246-253 first-wins contract), None when no cell
    * matches. Runs as a typed map — arbitrary user code never blocks
    * whole-stage codegen for the relational stages around it, and the
    * object boundary keeps the extractor a per-partition singleton. */
  def attach(events: DataFrame, extractor: PayloadExtractor): DataFrame = {
    implicit val enc = Encoders.product[MutationEvent]
    events
      .select("table", "rowKey", "seq", "writeTime", "cells", "payload")
      .as[MutationEvent]
      .map { e =>
        e.copy(payload = e.cells.iterator
          .map(c => extractor.extractPayload(e.table, c))
          .collectFirst { case Some(p) => p })
      }
      .toDF()
  }
}
