package graft.mapping

import graft.SparkSpec
import graft.conf.{FieldDef, ValueSource}
import org.apache.spark.sql.functions._

/** P5 custom value-mapper plug-in: reflective load, malformed-value-drops
  * semantics, byte[] pass-through, fail-fast on unknown class names. */
class ValueMapperSpec extends SparkSpec {

  private def cellsDf = {
    import spark.implicits._
    Seq(
      ("r1", Seq(("info", "name", 0L, "put", "a#b#c"))),
      ("r2", Seq(("info", "name", 0L, "put", "nodelim"))),
      ("r3", Seq(("info", "name", 0L, "put", null.asInstanceOf[String])))
    ).toDF("rowKey", "raw")
      .select(col("rowKey"), transform(col("raw"), c => struct(
        c.getField("_1").as("family"), c.getField("_2").as("qualifier"),
        c.getField("_3").as("ts"), c.getField("_4").as("cellType"),
        c.getField("_5").as("value"))).as("cells"))
  }

  test("custom mapper: multi-valued emit; malformed and null values drop silently") {
    val f = FieldDef("parts", "info:name", ValueSource.Value, "graft.mapping.SplitHashMapper")
    val out = cellsDf
      .select(col("rowKey"), Mapping.extractTyped(col("cells"), f).as("v"))
      .orderBy("rowKey")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("r1") == List("a", "b", "c"))
    assert(out("r2") == Nil, "value without '#' is malformed → dropped, row kept")
    assert(out("r3") == Nil)
  }

  test("mapper-emptied fields are absent from the doc map") {
    val conf = graft.conf.IndexerConf(table = "t", fields = Seq(
      FieldDef("parts", "info:name", ValueSource.Value, "graft.mapping.SplitHashMapper")))
    val docs = cellsDf
      .select(col("rowKey"), Mapping.docMap(conf)(col("cells")).as("doc"))
      .orderBy("rowKey")
      .collect().map(r => r.getString(0) -> r.getMap[String, scala.collection.Seq[String]](1)).toMap
    assert(docs("r1").get("parts").map(_.toList).contains(List("a", "b", "c")))
    assert(!docs("r2").contains("parts"))
  }

  test("built-in typed extraction drops malformed values under ANSI mode (never throws)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true", "precondition: ANSI default on")
    import spark.implicits._
    val f = FieldDef("v", "info:q", ValueSource.Value, "int")
    val out = Seq(("r1", "notanint"), ("r2", "7")).toDF("rowKey", "v")
      .select(col("rowKey"), array(struct(
        lit("info").as("family"), lit("q").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
      .select(col("rowKey"), Mapping.extractTyped(col("cells"), f).as("t"))
      .orderBy("rowKey")
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    assert(out("r1") == Nil, "malformed value dropped, row kept")
    assert(out("r2") == List(7))
  }

  test("byte[] type is a binary pass-through of the stored value") {
    val f = FieldDef("blob", "info:name", ValueSource.Value, "byte[]")
    val out = cellsDf.filter(col("rowKey") === "r1")
      .select(Mapping.extractTyped(col("cells"), f).as("v"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(out.map(new String(_, "UTF-8")).toList == List("a#b#c"))
  }

  test("unknown type/class name fails at plan-compile time") {
    val f = FieldDef("x", "info:name", ValueSource.Value, "no.such.MapperClass")
    val e = intercept[IllegalArgumentException] {
      cellsDf.select(Mapping.extractTyped(col("cells"), f))
    }
    assert(e.getMessage.contains("no.such.MapperClass"))
  }
}
