package graft.conf

import org.scalatest.funsuite.AnyFunSuite

/** P4 conf parsing — mirroring the reference's IndexerConfTest /
  * XSD-equivalent validation (indexerconf.xsd:3-64): defaults, table
  * prefixes, field/wildcard grammar, and rejection of unknown
  * attributes/elements. */
class ConfSpec extends AnyFunSuite {

  test("defaults match the reference (IndexerConf.java:71-77, FieldDefinition.java:47-57)") {
    val c = IndexerConf.fromXml("""<indexer table="t"><field name="f" value="cf:q"/></indexer>""")
    assert(c.mappingType == MappingType.Row)
    assert(c.rowReadMode == RowReadMode.Dynamic)
    assert(c.uniqueKeyField == "id")
    assert(c.keyFormat == KeyFormat.StringFormat)
    val f = c.fields.head
    assert(f.source == ValueSource.Value && f.typeName == "string" && !f.prefixMatch)
  }

  test("table spec prefixes: regex:, literal:, bare (IndexerConf.java:90-119)") {
    assert(IndexerConf.parseTableSpec("regex:t.*") == ("t.*", true))
    assert(IndexerConf.parseTableSpec("literal:regex:ish") == ("regex:ish", false))
    assert(IndexerConf.parseTableSpec("plain") == ("plain", false))
  }

  test("wildcard grammar: prefix match, qualifier source requires wildcard") {
    val c = IndexerConf.fromXml(
      """<indexer table="t">
        |  <field name="f" value="cf:pre*" source="qualifier" type="long"/>
        |</indexer>""".stripMargin)
    val f = c.fields.head
    assert(f.prefixMatch && f.qualifier == "pre" && f.source == ValueSource.Qualifier)
    intercept[IllegalArgumentException] {
      FieldDef("f", "cf:q", ValueSource.Qualifier, "string") // non-wildcard qualifier source
    }
    intercept[IllegalArgumentException] {
      FieldDef("f", "noColon", ValueSource.Value, "string")
    }
  }

  test("unknown attributes and elements are rejected (XSD-equivalent strictness)") {
    intercept[IllegalArgumentException] {
      IndexerConf.fromXml("""<indexer table="t" bogus="x"/>""")
    }
    intercept[IllegalArgumentException] {
      IndexerConf.fromXml("""<indexer table="t"><bogus/></indexer>""")
    }
    intercept[IllegalArgumentException] {
      IndexerConf.fromXml("""<notindexer table="t"/>""")
    }
    intercept[IllegalArgumentException] {
      IndexerConf.fromXml("""<indexer/>""") // table is required
    }
  }

  test("params, mapper attribute, key formatter aliases parse") {
    val c = IndexerConf.fromXml(
      """<indexer table="t" mapper="com.example.M" unique-key-formatter="hexuniquekeyformatter">
        |  <param name="morphlineVariable.cf" value="info"/>
        |</indexer>""".stripMargin)
    assert(c.mapperClass.contains("com.example.M"))
    assert(c.keyFormat == KeyFormat.HexFormat)
    assert(c.params == Map("morphlineVariable.cf" -> "info"))
  }

  test("custom key-formatter class loads at parse time; junk names fail fast (IndexerIT.java:605)") {
    val c = IndexerConf.fromXml(
      """<indexer table="t" unique-key-formatter="graft.mapping.PrefixedHexKeyFormatter"/>""")
    assert(c.keyFormat == KeyFormat.CustomFormat("graft.mapping.PrefixedHexKeyFormatter"))
    // loadClass semantics: a class that doesn't exist — or isn't a
    // KeyFormatter — is a conf-parse error, never a runtime one
    intercept[IllegalArgumentException] {
      IndexerConf.fromXml("""<indexer table="t" unique-key-formatter="no.such.Formatter"/>""")
    }
    intercept[IllegalArgumentException] {
      IndexerConf.fromXml(
        """<indexer table="t" unique-key-formatter="graft.mapping.SplitHashMapper"/>""")
    }
  }

  test("toXml round-trips: fromXml(toXml(conf)) == conf (XmlIndexerConfWriterTest parity)") {
    val confs = Seq(
      IndexerConf(table = "t"),
      IndexerConf(table = "t",
        keyFormat = KeyFormat.CustomFormat("graft.mapping.PrefixedHexKeyFormatter")),
      IndexerConf(table = "t.*", tableIsRegex = true,
        mappingType = MappingType.Column, rowReadMode = RowReadMode.Never,
        uniqueKeyField = "docid", rowField = Some("row_s"),
        columnFamilyField = Some("fam_s"), tableNameField = Some("tbl_s"),
        keyFormat = KeyFormat.HexFormat,
        fields = Seq(
          FieldDef("name_s", "info:name", ValueSource.Value, "string"),
          FieldDef("q_*", "info:pre*", ValueSource.Qualifier, "string"),
          FieldDef("bal_d", "info:acctbal", ValueSource.Value, "double")),
        params = Map("morphlineVariable.cf" -> "info", "morphlineField.src" -> "hbase"),
        mapperClass = Some("com.example.M")),
      // a literal table that LOOKS like a spec prefix must survive
      IndexerConf(table = "regex:ish"),
      IndexerConf(table = "esc", fields = Seq(
        FieldDef("odd\"name", "f", "q<&>", false, ValueSource.Value, "string"))))
    confs.foreach { c =>
      val xml = IndexerConf.toXml(c)
      assert(IndexerConf.fromXml(xml) == c, s"round-trip broke for:\n$xml")
    }
  }
}
