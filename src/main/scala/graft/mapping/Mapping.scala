package graft.mapping

import graft.conf._
import graft.expr.hfunctions._
import graft.model.CellType
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles an [[graft.conf.IndexerConf]] into `Column` expression trees
  * over the engine's conventional mutation shape:
  *
  * {{{
  *   table: string, rowKey: string, seq: long, writeTime: long,
  *   cells: array<struct<family,qualifier,ts,cellType,value>>, payload: string
  * }}}
  *
  * This is the Spark-native re-expression of the reference's compiled
  * extraction pipeline (/root/reference hbase-indexer-engine
  * .../parse/DefaultResultToSolrMapper.java:68-156): everything is a
  * declarative expression, so Catalyst constant-folds the config and
  * whole-stage codegen fuses the extraction with up/downstream operators —
  * the reference's "compile config once, run per event" becomes "compile
  * config into the plan".
  */
object Mapping {

  // ---- cell-level predicates ----

  /** Does this cell match the field's column spec? (reference
    * SingleCellExtractor.isApplicable / AbstractPrefixMatchingExtractor
    * .isApplicable). */
  def cellMatches(cell: Column, f: FieldDef): Column = {
    val fam = cell.getField("family") === lit(f.family)
    if (f.prefixMatch) fam && cell.getField("qualifier").startsWith(f.qualifier)
    else fam && cell.getField("qualifier") === lit(f.qualifier)
  }

  def isDeleteCell(cell: Column): Column = cell.getField("cellType") =!= lit(CellType.Put)

  /** Reference isRelevantKV (DefaultResultToSolrMapper.java:119-126):
    * ≥1 configured extractor applies to the cell. */
  def isRelevantCell(conf: IndexerConf)(cell: Column): Column =
    conf.fields.map(f => cellMatches(cell, f)).reduceOption(_ || _).getOrElse(lit(false))

  /** Row-path event relevance (reference Indexer.java:300-311): any cell
    * relevant or any cell a delete. */
  def isRelevantEvent(conf: IndexerConf)(cells: Column): Column =
    exists(cells, c => isRelevantCell(conf)(c) || isDeleteCell(c))

  /** Reference containsRequiredData (DefaultResultToSolrMapper.java:109-116):
    * true iff the event's own put-cells already cover every configured
    * column. Any prefix field ⇒ false (can never prove completeness —
    * AbstractPrefixMatchingExtractor.containsTarget:88-91). */
  def containsRequiredData(conf: IndexerConf)(cells: Column): Column =
    if (conf.fields.isEmpty || conf.fields.exists(_.prefixMatch)) lit(false)
    else conf.fields.map { f =>
      exists(cells, c => !isDeleteCell(c) && cellMatches(c, f))
    }.reduce(_ && _)

  // ---- extraction (the SELECT list) ----

  /** Put-cells of `cells` matching `f`, in qualifier order for prefix
    * matches (the reference iterates a sorted family map —
    * AbstractPrefixMatchingExtractor.java:57-71). */
  private def matchingPutCells(cells: Column, f: FieldDef): Column = {
    val matched = filter(cells, c => !isDeleteCell(c) && cellMatches(c, f))
    if (f.prefixMatch)
      array_sort(matched, (l, r) =>
        when(l.getField("qualifier") < r.getField("qualifier"), -1)
          .when(l.getField("qualifier") > r.getField("qualifier"), 1)
          .otherwise(0))
    else matched
  }

  /** Raw (string) multi-valued extraction for one field: values, or matched
    * qualifiers when source=qualifier (reference
    * PrefixMatchingQualifierExtractor returns the full qualifier). */
  def extractRaw(cells: Column, f: FieldDef): Column = {
    val cellsM = matchingPutCells(cells, f)
    f.source match {
      case ValueSource.Value     => transform(cellsM, _.getField("value"))
      case ValueSource.Qualifier => transform(cellsM, _.getField("qualifier"))
    }
  }

  /** Built-in type names → Spark cast target (§1.2 of SURVEY.md). `None`
    * = string identity. `byte[]` is the morphline pass-through type
    * (ExtractHBaseCellsBuilder.java:148-154): the raw bytes untouched. */
  private val builtinCasts: Map[String, Option[String]] = Map(
    "string"     -> None,
    "int"        -> Some("int"),
    "long"       -> Some("long"),
    "short"      -> Some("short"),
    "float"      -> Some("float"),
    "double"     -> Some("double"),
    "boolean"    -> Some("boolean"),
    "bigdecimal" -> Some("decimal(38,18)"),
    "byte[]"     -> Some("binary"))

  def isBuiltinType(typeName: String): Boolean = builtinCasts.contains(typeName)

  /** Spark type for a built-in reference type name. */
  def sparkCast(typeName: String): Option[String] =
    builtinCasts.getOrElse(typeName,
      throw new IllegalArgumentException(s"unknown built-in type: $typeName"))

  /** Custom-mapped multi-valued extraction (P5): one UDF call per row
    * applies the plug-in to every raw value; malformed values yield
    * nothing (ValueMapper.safeMap). The class loads at plan-compile time
    * so an unknown name fails fast. */
  private def extractMapped(raw: Column, className: String): Column = {
    val mapper = ValueMapper.load(className)
    val fn = udf((vs: Seq[String]) =>
      if (vs == null) Seq.empty[String] else vs.flatMap(ValueMapper.safeMap(mapper, _)))
    fn(raw)
  }

  /** Typed multi-valued extraction (array of the field's Spark type).
    * Malformed values become NULLs inside the array, then are dropped —
    * the reference's decode-failure-drops-value semantics
    * (ByteArrayValueMappers.java:154-164). A non-built-in type name is a
    * [[ValueMapper]] class (P5), reflectively loaded like the reference's
    * ByteArrayValueMappers.java:128-142. */
  def extractTyped(cells: Column, f: FieldDef): Column = {
    val raw = extractRaw(cells, f)
    if (isBuiltinType(f.typeName))
      sparkCast(f.typeName) match {
        case None      => raw
        // try_cast, NOT cast: under ANSI mode (Spark 4 default) a plain
        // cast THROWS on malformed input, which would fail the row — the
        // reference's contract is drop-the-value, keep-the-row
        case Some(typ) => filter(transform(raw, _.try_cast(typ)), _.isNotNull)
      }
    else extractMapped(raw, f.typeName)
  }

  /** The whole static-field document as a map<string, array<string>> —
    * fields with no extracted values are absent (the reference adds no
    * field then — HBaseSolrDocumentExtractor.java:47-53). Dynamic-name
    * fields (name ending '*') contribute (prefix+qualifier-tail) entries
    * (reference ExtractHBaseCellsBuilder.java:223-240). */
  def docMap(conf: IndexerConf)(cells: Column): Column = {
    val staticFields = conf.fields.filterNot(_.dynamicName)
    val dynFields = conf.fields.filter(_.dynamicName)

    // built-in types keep the raw stored string in the doc; a custom
    // ValueMapper type's doc values are the MAPPER's outputs (the
    // reference stringifies mapper outputs into the Solr doc); a
    // mapper-emptied field is then absent like any other empty field
    def docValues(f: FieldDef): Column =
      if (isBuiltinType(f.typeName)) extractRaw(cells, f)
      else extractMapped(extractRaw(cells, f), f.typeName)

    val staticMap: Option[Column] = if (staticFields.isEmpty) None else Some(
      map_filter(
        map_from_arrays(
          array(staticFields.map(f => lit(f.name)): _*),
          array(staticFields.map(f => docValues(f)): _*)),
        (_, v) => size(v) > 0))

    val dynMaps: Seq[Column] = dynFields.map { f =>
      val prefix = f.name.dropRight(1)
      val matched = matchingPutCells(cells, f)
      map_from_entries(
        transform(matched, c => struct(
          concat(lit(prefix), expr_qual_tail(c, f)).as("key"),
          array(c.getField("value")).as("value"))))
    }

    (staticMap.toSeq ++ dynMaps).reduceOption((a, b) => map_concat(a, b))
      .getOrElse(map_from_arrays(array(), array()).cast("map<string,array<string>>"))
  }

  /** Tail of the qualifier after the matched prefix — the dynamic part of a
    * dynamic output field name. */
  private def expr_qual_tail(cell: Column, f: FieldDef): Column =
    cell.getField("qualifier").substr(lit(f.qualifier.length + 1), lit(Int.MaxValue))

  // ---- unique-key formatting per conf (P12-P15) ----

  /** Custom-formatter row id as a UDF (same plug-in trade-off as
    * [[extractMapped]]: user classes can't run inside a compiled
    * expression). The class loads at plan-compile time — an unknown
    * name fails fast, and executors deserialize the loaded instance. */
  private def customRowKey(className: String)(rowKey: Column): Column = {
    val fmt = KeyFormatter.load(className)
    val fn = udf((r: Array[Byte]) => fmt.formatRow(r))
    fn(rowKey.cast("binary"))
  }

  private def customCellKey(className: String)(rowKey: Column, family: Column, qualifier: Column): Column = {
    val fmt = KeyFormatter.load(className)
    val fn = udf((r: Array[Byte], f: Array[Byte], q: Array[Byte]) =>
      fmt.formatKeyValue(r, f, q))
    fn(rowKey.cast("binary"), family.cast("binary"), qualifier.cast("binary"))
  }

  /** Row-path document id. A single component is NOT escaped (reference
    * BaseUniqueKeyFormatter.formatRow just encodes); only multi-component
    * ids escape hyphens before joining. Multi-table (regex) indexers
    * prepend the table (reference UniqueTableKeyFormatter.java:24-61; for
    * non-string formatters the table name joins the formatted key with
    * '-', the hex treatment). */
  def formatRowKey(conf: IndexerConf)(rowKey: Column, table: Column): Column = {
    val base = conf.keyFormat match {
      case KeyFormat.StringFormat      => rowKey
      case KeyFormat.HexFormat         => format_key_hex(rowKey.cast("binary"))
      case KeyFormat.CustomFormat(cls) => customRowKey(cls)(rowKey)
    }
    if (!conf.tableIsRegex) base
    else conf.keyFormat match {
      case KeyFormat.StringFormat => format_key(table, rowKey)
      case _                      => concat_ws("-", table, base)
    }
  }

  /** Column-path id: row-family-qualifier (reference
    * BaseUniqueKeyFormatter.formatKeyValue); a custom formatter owns the
    * whole cell id (its formatKeyValue), built-ins compose per part. */
  def formatCellKey(conf: IndexerConf)(rowKey: Column, family: Column, qualifier: Column, table: Column): Column = {
    val comps = conf.keyFormat match {
      case KeyFormat.StringFormat => Seq(rowKey, family, qualifier)
      case KeyFormat.HexFormat =>
        Seq(format_key_hex(rowKey.cast("binary")), format_key_hex(family.cast("binary")),
          format_key_hex(qualifier.cast("binary")))
      case KeyFormat.CustomFormat(cls) =>
        Seq(customCellKey(cls)(rowKey, family, qualifier))
    }
    val parts = if (conf.tableIsRegex) table +: comps else comps
    conf.keyFormat match {
      case KeyFormat.StringFormat => format_key(parts: _*)
      case _                      => concat_ws("-", parts: _*)
    }
  }
}
