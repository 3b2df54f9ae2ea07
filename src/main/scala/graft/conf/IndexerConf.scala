package graft.conf

/** Typed AST for the reference's `<indexer>` XML dialect.
  *
  * Shapes and defaults mirror /root/reference hbase-indexer-engine
  * .../conf/IndexerConf.java:71-77 (mapping-type=row, read-row=dynamic,
  * unique-key-field="id", formatter=string) and FieldDefinition.java:47-57
  * (source defaults to VALUE, type defaults to "string"); the grammar is
  * .../conf/indexerconf.xsd:3-64.
  */
sealed trait MappingType
object MappingType {
  case object Row extends MappingType
  case object Column extends MappingType
  def parse(s: String): MappingType = s.toLowerCase match {
    case "row"    => Row
    case "column" => Column
    case other    => throw new IllegalArgumentException(s"mapping-type: $other")
  }
}

sealed trait RowReadMode
object RowReadMode {
  case object Dynamic extends RowReadMode
  case object Never extends RowReadMode
  def parse(s: String): RowReadMode = s.toLowerCase match {
    case "dynamic" => Dynamic
    case "never"   => Never
    case other     => throw new IllegalArgumentException(s"read-row: $other")
  }
}

sealed trait ValueSource
object ValueSource {
  case object Value extends ValueSource
  case object Qualifier extends ValueSource
  def parse(s: String): ValueSource = s.toLowerCase match {
    case "value"     => Value
    case "qualifier" => Qualifier
    case other       => throw new IllegalArgumentException(s"source: $other")
  }
}

sealed trait KeyFormat
object KeyFormat {
  /** UTF-8 components joined with '-' (hyphens escaped). */
  case object StringFormat extends KeyFormat
  /** lowercase hex of the raw bytes. */
  case object HexFormat extends KeyFormat
  /** Any other name is a [[graft.mapping.KeyFormatter]] class, loaded
    * reflectively like the reference's `loadClass(name,
    * UniqueKeyFormatter.class)` (DefaultIndexerComponentFactory.java:
    * 100-104); loading here means a typo fails at conf-parse time. */
  final case class CustomFormat(className: String) extends KeyFormat
  def parse(s: String): KeyFormat = s.toLowerCase match {
    case "string" | "stringuniquekeyformatter" => StringFormat
    case "hex" | "hexuniquekeyformatter"       => HexFormat
    case _ =>
      graft.mapping.KeyFormatter.load(s) // fail fast; instance discarded
      CustomFormat(s)
  }
}

/** One `<field>`: output field name × input column spec × source × type.
  *
  *  - `value` is `family:qualifier` or `family:prefix*` (prefix match);
  *  - `source=qualifier` projects the matched qualifier instead of the cell
  *    value (only valid with a wildcard — reference
  *    ByteArrayExtractors.java:38-60 rejects the combination otherwise);
  *  - `name` may end in '*' → dynamic output field (name = prefix + the
  *    unmatched qualifier tail), reference ExtractHBaseCellsBuilder.java:223-240.
  */
case class FieldDef(
    name: String,
    family: String,
    qualifier: String,
    prefixMatch: Boolean,
    source: ValueSource,
    typeName: String) {
  require(!(source == ValueSource.Qualifier && !prefixMatch),
    s"field $name: source=qualifier requires a wildcard column spec")
  def dynamicName: Boolean = name.endsWith("*")
}

object FieldDef {
  /** Parse `family:qualifier[*]` into its parts. */
  def apply(name: String, valueSpec: String, source: ValueSource, typeName: String): FieldDef = {
    val idx = valueSpec.indexOf(':')
    require(idx > 0, s"field $name: value must be family:qualifier, got $valueSpec")
    val family = valueSpec.substring(0, idx)
    val qual = valueSpec.substring(idx + 1)
    if (qual.endsWith("*"))
      new FieldDef(name, family, qual.dropRight(1), true, source, typeName)
    else
      new FieldDef(name, family, qual, false, source, typeName)
  }
}

case class IndexerConf(
    table: String,
    tableIsRegex: Boolean = false,
    mappingType: MappingType = MappingType.Row,
    rowReadMode: RowReadMode = RowReadMode.Dynamic,
    uniqueKeyField: String = "id",
    rowField: Option[String] = None,
    columnFamilyField: Option[String] = None,
    tableNameField: Option[String] = None,
    keyFormat: KeyFormat = KeyFormat.StringFormat,
    fields: Seq[FieldDef] = Seq.empty,
    params: Map[String, String] = Map.empty,
    /** P17: fully-qualified class name of a [[graft.core.RecordMapper]]
      * plug-in replacing the declarative mapping stage (reference
      * `mapper=` attribute). */
    mapperClass: Option[String] = None)

object IndexerConf {

  /** Parses `table="regex:…"` / `"literal:…"` prefixes — reference
    * IndexerConf.java:90-119. A bare name is a literal. */
  def parseTableSpec(spec: String): (String, Boolean) =
    if (spec.startsWith("regex:")) (spec.stripPrefix("regex:"), true)
    else if (spec.startsWith("literal:")) (spec.stripPrefix("literal:"), false)
    else (spec, false)

  /** Parse the `<indexer>` XML dialect (JDK DOM — no external deps).
    * Unknown attributes/elements are rejected, mirroring the reference's
    * XSD validation (indexerconf.xsd:3-64). */
  def fromXml(xml: String): IndexerConf = {
    import javax.xml.parsers.DocumentBuilderFactory
    import org.w3c.dom.Element
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val root = doc.getDocumentElement
    require(root.getTagName == "indexer", s"root element must be <indexer>, got <${root.getTagName}>")

    def attr(e: Element, name: String): Option[String] =
      if (e.hasAttribute(name)) Some(e.getAttribute(name)) else None

    val knownAttrs = Set("table", "mapping-type", "read-row", "unique-key-field",
      "row-field", "column-family-field", "table-name-field", "unique-key-formatter",
      "mapper")
    val attrs = root.getAttributes
    (0 until attrs.getLength).foreach { i =>
      val n = attrs.item(i).getNodeName
      require(knownAttrs.contains(n), s"unknown <indexer> attribute: $n")
    }

    val (table, isRegex) = parseTableSpec(
      attr(root, "table").getOrElse(throw new IllegalArgumentException("<indexer> requires table=")))

    val children = root.getChildNodes
    val fields = Seq.newBuilder[FieldDef]
    val params = Map.newBuilder[String, String]
    (0 until children.getLength).foreach { i =>
      children.item(i) match {
        case e: Element if e.getTagName == "field" =>
          fields += FieldDef(
            name = e.getAttribute("name"),
            valueSpec = e.getAttribute("value"),
            source = attr(e, "source").map(ValueSource.parse).getOrElse(ValueSource.Value),
            typeName = attr(e, "type").getOrElse("string"))
        case e: Element if e.getTagName == "param" =>
          params += (e.getAttribute("name") -> e.getAttribute("value"))
        case e: Element =>
          throw new IllegalArgumentException(s"unknown element <${e.getTagName}>")
        case _ => // text/comment nodes
      }
    }

    IndexerConf(
      table = table,
      tableIsRegex = isRegex,
      mappingType = attr(root, "mapping-type").map(MappingType.parse).getOrElse(MappingType.Row),
      rowReadMode = attr(root, "read-row").map(RowReadMode.parse).getOrElse(RowReadMode.Dynamic),
      uniqueKeyField = attr(root, "unique-key-field").getOrElse("id"),
      rowField = attr(root, "row-field"),
      columnFamilyField = attr(root, "column-family-field"),
      tableNameField = attr(root, "table-name-field"),
      keyFormat = attr(root, "unique-key-formatter").map(KeyFormat.parse).getOrElse(KeyFormat.StringFormat),
      fields = fields.result(),
      params = params.result(),
      mapperClass = attr(root, "mapper"))
  }

  /** Render a conf back to the `<indexer>` XML dialect — the inverse of
    * [[fromXml]] (reference XmlIndexerConfWriter; its test round-trips
    * conf → XML → conf, mirrored in ConfSpec). Defaults are omitted, so
    * the output is the minimal document that parses back equal; DOM +
    * Transformer handle attribute escaping, never string concatenation. */
  def toXml(conf: IndexerConf): String = {
    import javax.xml.parsers.DocumentBuilderFactory
    val doc = DocumentBuilderFactory.newInstance().newDocumentBuilder().newDocument()
    val root = doc.createElement("indexer")
    doc.appendChild(root)
    // a literal table that itself starts with a spec prefix must be
    // explicitly prefixed or it would re-parse as that spec
    val tableSpec =
      if (conf.tableIsRegex) s"regex:${conf.table}"
      else if (conf.table.startsWith("regex:") || conf.table.startsWith("literal:"))
        s"literal:${conf.table}"
      else conf.table
    root.setAttribute("table", tableSpec)
    if (conf.mappingType != MappingType.Row) root.setAttribute("mapping-type", "column")
    if (conf.rowReadMode != RowReadMode.Dynamic) root.setAttribute("read-row", "never")
    if (conf.uniqueKeyField != "id") root.setAttribute("unique-key-field", conf.uniqueKeyField)
    conf.rowField.foreach(root.setAttribute("row-field", _))
    conf.columnFamilyField.foreach(root.setAttribute("column-family-field", _))
    conf.tableNameField.foreach(root.setAttribute("table-name-field", _))
    conf.keyFormat match {
      case KeyFormat.StringFormat => // default, omitted
      case KeyFormat.HexFormat => root.setAttribute("unique-key-formatter", "hex")
      case KeyFormat.CustomFormat(cls) => root.setAttribute("unique-key-formatter", cls)
    }
    conf.mapperClass.foreach(root.setAttribute("mapper", _))
    conf.fields.foreach { f =>
      val e = doc.createElement("field")
      e.setAttribute("name", f.name)
      e.setAttribute("value",
        s"${f.family}:${f.qualifier}${if (f.prefixMatch) "*" else ""}")
      if (f.source != ValueSource.Value) e.setAttribute("source", "qualifier")
      if (f.typeName != "string") e.setAttribute("type", f.typeName)
      root.appendChild(e)
    }
    conf.params.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val e = doc.createElement("param")
      e.setAttribute("name", k)
      e.setAttribute("value", v)
      root.appendChild(e)
    }
    val tf = javax.xml.transform.TransformerFactory.newInstance().newTransformer()
    tf.setOutputProperty(javax.xml.transform.OutputKeys.OMIT_XML_DECLARATION, "yes")
    tf.setOutputProperty(javax.xml.transform.OutputKeys.INDENT, "yes")
    val sw = new java.io.StringWriter()
    tf.transform(new javax.xml.transform.dom.DOMSource(doc),
      new javax.xml.transform.stream.StreamResult(sw))
    sw.toString
  }
}
