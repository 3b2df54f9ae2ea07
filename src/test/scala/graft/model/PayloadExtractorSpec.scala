package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the P16 plug-in seam: reflective load by name, the stock
  * (table, family, qualifier) matcher, and the first-payload-wins
  * per-event contract (reference SepConsumer.java:246-253). */
class PayloadExtractorSpec extends SparkSpec {

  private def cell(f: String, q: String, v: String) =
    Cell(f, q, 0L, "put", v)

  test("BasePayloadExtractor matches exactly (table, family, qualifier)") {
    val ex = new BasePayloadExtractor("t1", "info", "blob")
    assert(ex.extractPayload("t1", cell("info", "blob", "p")) == Some("p"))
    assert(ex.extractPayload("t2", cell("info", "blob", "p")).isEmpty)
    assert(ex.extractPayload("t1", cell("info", "other", "p")).isEmpty)
    assert(ex.extractPayload("t1", cell("meta", "blob", "p")).isEmpty)
  }

  test("load by class name; unknown class fails at wiring time") {
    val ex = PayloadExtractor.load("graft.model.SysPayloadExtractor")
    assert(ex.extractPayload("any", cell("sys", "payload", "x")) == Some("x"))
    intercept[IllegalArgumentException](PayloadExtractor.load("no.such.Extractor"))
    intercept[IllegalArgumentException](PayloadExtractor.load("java.lang.String"))
  }

  test("attach: first matching cell wins; no match leaves payload empty") {
    import spark.implicits._
    val events = Seq(
      MutationEvent("t", "r1", 1L, 0L,
        Seq(cell("a", "q", "v"), cell("sys", "payload", "first"),
          cell("sys", "payload", "second")), Some("stale")),
      MutationEvent("t", "r2", 2L, 0L, Seq(cell("a", "q", "v")), Some("stale"))
    ).toDF()
    val out = PayloadExtractor.attach(events,
      PayloadExtractor.load("graft.model.SysPayloadExtractor"))
      .select("rowKey", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("r1") == Some("first"), "first extracted payload must win")
    assert(out("r2").isEmpty, "no matching cell must clear the stale payload")
  }
}
