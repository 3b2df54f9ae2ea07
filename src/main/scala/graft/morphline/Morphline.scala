package graft.morphline

import graft.conf.{FieldDef, IndexerConf, ValueSource}
import graft.mapping.Mapping
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The morphline-equivalent ETL layer (SURVEY §2.3 P10/P11): a
  * config-driven command chain compiled to one `Column` document
  * expression. Scope covers what the reference's tests exercise
  * (hbase-indexer-morphlines `ExtractHBaseCellsBuilder.java:101-240` and
  * the test-morphlines configs) — `extractHBaseCells` with its three
  * output modes (single field, positional `outputFields` with empty name
  * ⇒ skip position, dynamic `outputField: "prefix*"`),
  * `sanitizeUnknownSolrFields` (schema projection), `logDebug` (no-op) —
  * plus the widening set of downstream Kite commands a real morphline
  * chains after extraction: grok, split, convertTimestamp, findReplace,
  * removeFields, setValues/addValues, extractURIComponents,
  * extractURIQueryParameters, toLowerCase/toUpperCase, translate,
  * extractJsonPaths, contains, if, tryRules. Multi-valued fields follow
  * Kite's per-value iteration contract throughout. Config is JSON — the
  * reference's HOCON documents for these commands are structurally
  * identical.
  *
  * Like the reference (which compiles the morphline once per task and
  * streams records through it), the chain is compiled once into the
  * plan; unlike the reference the "records" never materialize — the
  * commands fuse into whole-stage codegen with everything around them.
  */
object Morphline {

  case class CellMapping(
      inputColumn: String,
      outputField: Option[String],
      outputFields: Seq[String],
      typeName: String,
      source: ValueSource) {
    def toFieldDef(name: String): FieldDef =
      FieldDef(name, inputColumn, source, typeName)
  }

  sealed trait Command
  case class ExtractHBaseCells(mappings: Seq[CellMapping]) extends Command
  case class SanitizeUnknownFields(knownFields: Seq[String]) extends Command
  case object LogDebug extends Command
  /** Kite `grok`: regex named-capture extraction, scoped to numbered
    * groups — group i+1 lands in `outputFields(i)` (empty name skips the
    * group). A non-matching record gains no fields, like Kite grok with
    * `extract: true` on a miss. */
  case class Grok(inputField: String, pattern: String, outputFields: Seq[String]) extends Command
  /** Kite `split`: separator-split of a field into a MULTI-VALUED output
    * field (the document's array<string> values are the natural target). */
  case class Split(inputField: String, outputField: String, separator: String,
                   isRegex: Boolean) extends Command
  /** Kite `convertTimestamp`: re-render a time field in place; input
    * formats are tried in order, `outputFormat` is a pattern or the
    * `unixTimeInMillis` keyword. An unparseable value clears the field
    * (Kite's record-drop analogue at field granularity). */
  case class ConvertTimestamp(field: String, inputFormats: Seq[String],
                              outputFormat: String) extends Command
  /** Kite `findReplace`: rewrite EVERY value of a multi-valued field in
    * place — literal substring replacement by default, regex when
    * `isRegex`; all occurrences are replaced. A missing field stays
    * missing. */
  case class FindReplace(field: String, pattern: String, replacement: String,
                         isRegex: Boolean) extends Command
  /** Kite `removeFields` (blacklist form): drop the named fields from
    * every record — the complement of sanitize's whitelist. */
  case class RemoveFields(blacklist: Seq[String]) extends Command
  /** Kite `setValues`: replace each named field's values with the given
    * literals (a missing field is created). Config form is Kite's —
    * an object of field → value or [values]. */
  case class SetValues(fields: Seq[(String, Seq[String])]) extends Command
  /** Kite `addValues`: append the given literal values to each named
    * field (existing values stay — the add-alongside merge the forced
    * `morphlineField.*` params use). */
  case class AddValues(fields: Seq[(String, Seq[String])]) extends Command
  /** Kite `extractURIComponents`: parse a URI-valued field and add its
    * components as `<prefix>scheme/host/port/path/query/fragment`
    * fields. Kite parses with `java.net.URI`; here each component is a
    * codegen'd regex over the RFC-3986 generic syntax — same answers on
    * well-formed absolute URIs, and an absent component adds no field
    * (Kite's missing-node convention). */
  case class ExtractUriComponents(inputField: String, prefix: String) extends Command
  /** Kite `extractURIQueryParameters`: every occurrence of the named
    * query parameter across every value of the (multi-valued) input
    * field appends its value to `outputField`, in order, capped at
    * `maxParameters` (Kite's cap; Int.MaxValue = unlimited). The query
    * string is taken from the pre-fragment substring, like
    * [[ExtractUriComponents]]. */
  case class ExtractUriQueryParams(inputField: String, parameter: String,
                                   outputField: String,
                                   maxParameters: Int) extends Command
  /** Kite `toLowerCase` / `toUpperCase`: rewrite every value of a field
    * in place (missing field stays missing). */
  case class ChangeCase(field: String, upper: Boolean) extends Command
  /** Kite `translate`: map each value of a field through a literal
    * dictionary. A miss takes the `fallback` when one is configured;
    * without a fallback the miss FAILS the command (Kite rejects the
    * record) — here the value drops from the field and, used as an
    * `if`/`tryRules` condition, the rule fails ([[foldRule]]). */
  case class Translate(field: String, dictionary: Seq[(String, String)],
                       fallback: Option[String]) extends Command
  /** Kite `addValuesIfAbsent`: like `addValues`, but a value is only
    * appended when the field does not already contain it (the
    * put-if-absent arm of AbstractAddValuesCommand; first-seen order,
    * a repeated literal adds once). */
  case class AddValuesIfAbsent(fields: Seq[(String, Seq[String])]) extends Command
  /** Kite `removeValues` (the named-field literal subset of
    * RemoveValuesBuilder's pattern algebra): delete every occurrence of
    * the given literal values from the named field. A field emptied by
    * the removal disappears from the record; a missing field stays
    * missing. */
  case class RemoveValues(fields: Seq[(String, Seq[String])]) extends Command
  /** Kite `splitKeyValue` (kite-morphlines-core SplitKeyValueBuilder):
    * each value of `inputField` splits at the FIRST `separator` into
    * (key, rest); the record gains field `outputFieldPrefix + key` with
    * the rest appended — multimap semantics, so a repeated key
    * accumulates values in input order. A value without the separator
    * contributes nothing; with `trim` (Kite's default) both sides are
    * space-trimmed. Output field NAMES are data-driven — the compiled
    * form folds the pairs into a map and add-alongside-merges it, the
    * dynamic-fields pattern of the P2 prefix extractor. */
  case class SplitKeyValue(inputField: String, outputFieldPrefix: String,
                           separator: String, doTrim: Boolean) extends Command
  /** Kite `extractJsonPaths` (kite-morphlines-json): extract nodes of a
    * JSON document into record fields by `/slash/separated` paths. Kite
    * reads the JSON from the record's attachment (a `readJson` product);
    * in this record model the document arrives as a FIELD's value —
    * `inputField` names it. With `flatten` (Kite's default), a path
    * landing on a JSON array emits one value per element; otherwise the
    * node lands as one value (scalars unquoted, containers as JSON
    * text). A missing path adds no field, like Kite on an absent node. */
  case class ExtractJsonPaths(inputField: String, flatten: Boolean,
                              paths: Seq[(String, String)]) extends Command
  /** Kite `contains`: succeeds iff the named field holds at least one of
    * the given values — the workhorse CONDITION command for `if` and
    * `tryRules` rule gating. As a transform it is the identity. */
  case class ContainsCmd(field: String, values: Seq[String]) extends Command
  /** Kite `equals`: succeeds iff, for every named field, the record's
    * value LIST equals the given literal list (order-sensitive exact
    * equality — RecordEqualsBuilder compares `record.get(field)` against
    * the configured list). A condition command like [[ContainsCmd]];
    * as a transform it is the identity. */
  case class EqualsCmd(fields: Seq[(String, Seq[String])]) extends Command
  /** Kite `not`: wraps one nested command and INVERTS its success — the
    * guard combinator for `if`/`tryRules` conditions (Kite's
    * NotBuilder). The nested command runs as a pure predicate: its
    * record effects are discarded (the meaningful children are the
    * condition commands, which have none). Outside a condition position
    * `not` is the identity. */
  case class NotCmd(inner: Command) extends Command
  /** Kite `decodeBase64` (kite-morphlines-core DecodeBase64Builder):
    * replace every value of `field` with its base64-decoded bytes — in
    * this string-valued record model, decoded as UTF-8 text. Failure is
    * value-granular like [[ConvertTimestamp]]: an undecodable value
    * drops; a field with no decodable values clears. */
  case class DecodeBase64(field: String) extends Command
  /** Kite `if`: run `conditions`; when every condition succeeds the
    * `then` chain processes the record AS TRANSFORMED by the conditions,
    * otherwise the `else` chain processes the ORIGINAL record (the same
    * copy-rollback a rejected [[TryRules]] rule gets — a failed
    * condition's partial effects are discarded). Failing commands are
    * the condition commands ([[Grok]] non-match, [[ContainsCmd]] miss);
    * everything else always succeeds. */
  case class IfThenElse(cond: Seq[Command], thenCmds: Seq[Command],
                        elseCmds: Seq[Command]) extends Command
  /** Kite `tryRules`: each rule is a child command chain; rules are tried
    * in order and the FIRST one that succeeds processes the record, the
    * rest are skipped. In this compiled model the only failing command is
    * `grok` (a non-match fails its rule, like Kite grok's default
    * `numRequiredMatches`); every other command always succeeds, so a
    * grok-free final rule is the catch-all, and a record no rule accepts
    * passes through unchanged. */
  case class TryRules(rules: Seq[Seq[Command]]) extends Command

  /** Parse a JSON command chain:
    * {{{
    * {"commands": [
    *   {"extractHBaseCells": {"mappings": [
    *     {"inputColumn": "info:name", "outputField": "name_s",
    *      "type": "string", "source": "value"}, ...]}},
    *   {"sanitizeUnknownSolrFields": {"knownFields": ["name_s"]}},
    *   {"tryRules": {"rules": [{"commands": [...]}, {"commands": [...]}]}},
    *   {"logDebug": {"format": "..."}}]}
    * }}} */
  def parse(json: String): Seq[Command] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(json)
    parseCommandList(root \ "commands", "morphline config")
  }

  private def parseCommandList(v: org.json4s.JValue, where: String): Seq[Command] = {
    import org.json4s._
    v match {
      case JArray(cmds) => cmds.map(parseCommand)
      case _ => throw new IllegalArgumentException(s"$where needs commands[]")
    }
  }

  private def parseCommand(cmd: org.json4s.JValue): Command = {
    import org.json4s._
    implicit val fmt: Formats = DefaultFormats
    cmd match {
      case JObject(List(("extractHBaseCells", body))) =>
        val mappings = (body \ "mappings") match {
          case JArray(ms) => ms.map { m =>
            CellMapping(
              inputColumn = (m \ "inputColumn").extract[String],
              outputField = (m \ "outputField").extractOpt[String],
              outputFields = (m \ "outputFields").extractOpt[Seq[String]].getOrElse(Nil),
              typeName = (m \ "type").extractOpt[String].getOrElse("string"),
              source = (m \ "source").extractOpt[String]
                .map(ValueSource.parse).getOrElse(ValueSource.Value))
          }
          case _ => throw new IllegalArgumentException("extractHBaseCells needs mappings[]")
        }
        ExtractHBaseCells(mappings)
      case JObject(List(("sanitizeUnknownSolrFields", body))) =>
        SanitizeUnknownFields((body \ "knownFields").extract[Seq[String]])
      case JObject(List(("logDebug", _))) => LogDebug
      case JObject(List(("grok", body))) =>
        Grok(
          inputField = (body \ "inputField").extract[String],
          pattern = (body \ "pattern").extract[String],
          outputFields = (body \ "outputFields").extract[Seq[String]])
      case JObject(List(("split", body))) =>
        Split(
          inputField = (body \ "inputField").extract[String],
          outputField = (body \ "outputField").extract[String],
          separator = (body \ "separator").extract[String],
          isRegex = (body \ "isRegex").extractOpt[Boolean].getOrElse(false))
      case JObject(List(("convertTimestamp", body))) =>
        ConvertTimestamp(
          field = (body \ "field").extract[String],
          inputFormats = (body \ "inputFormats").extract[Seq[String]],
          outputFormat = (body \ "outputFormat").extractOpt[String]
            .getOrElse("unixTimeInMillis"))
      case JObject(List(("findReplace", body))) =>
        FindReplace(
          field = (body \ "field").extract[String],
          pattern = (body \ "pattern").extract[String],
          replacement = (body \ "replacement").extract[String],
          isRegex = (body \ "isRegex").extractOpt[Boolean].getOrElse(false))
      case JObject(List(("removeFields", body))) =>
        RemoveFields((body \ "blacklist").extract[Seq[String]])
      case JObject(List(("setValues", JObject(fs)))) =>
        SetValues(fs.map { case (k, v) => k -> literalValues("setValues", k, v) })
      case JObject(List(("addValues", JObject(fs)))) =>
        AddValues(fs.map { case (k, v) => k -> literalValues("addValues", k, v) })
      case JObject(List(("addValuesIfAbsent", JObject(fs)))) =>
        AddValuesIfAbsent(fs.map { case (k, v) =>
          k -> literalValues("addValuesIfAbsent", k, v) })
      case JObject(List(("removeValues", JObject(fs)))) =>
        RemoveValues(fs.map { case (k, v) => k -> literalValues("removeValues", k, v) })
      case JObject(List(("extractURIComponents", body))) =>
        ExtractUriComponents(
          inputField = (body \ "inputField").extract[String],
          prefix = (body \ "outputFieldPrefix").extractOpt[String].getOrElse(""))
      case JObject(List(("extractURIQueryParameters", body))) =>
        ExtractUriQueryParams(
          inputField = (body \ "inputField").extract[String],
          parameter = (body \ "parameter").extract[String],
          outputField = (body \ "outputField").extract[String],
          maxParameters = (body \ "maxParameters").extractOpt[Int]
            .getOrElse(Int.MaxValue))
      case JObject(List(("toLowerCase", body))) =>
        ChangeCase((body \ "field").extract[String], upper = false)
      case JObject(List(("toUpperCase", body))) =>
        ChangeCase((body \ "field").extract[String], upper = true)
      case JObject(List(("translate", body))) =>
        val dict = (body \ "dictionary") match {
          case JObject(ps) => ps.map {
            case (k, JString(v)) => k -> v
            case (k, JInt(v))    => k -> v.toString
            case (k, other) => throw new IllegalArgumentException(
              s"translate.dictionary.$k must be a scalar, got $other")
          }
          case _ => throw new IllegalArgumentException("translate needs dictionary{}")
        }
        Translate(
          field = (body \ "field").extract[String],
          dictionary = dict,
          fallback = (body \ "fallback").extractOpt[String])
      case JObject(List(("splitKeyValue", body))) =>
        SplitKeyValue(
          inputField = (body \ "inputField").extract[String],
          outputFieldPrefix = (body \ "outputFieldPrefix").extractOpt[String].getOrElse(""),
          separator = (body \ "separator").extractOpt[String].getOrElse("="),
          doTrim = (body \ "trim").extractOpt[Boolean].getOrElse(true))
      case JObject(List(("extractJsonPaths", body))) =>
        val paths = (body \ "paths") match {
          case JObject(ps) => ps.map {
            case (out, JString(p)) => out -> p
            case (out, other) => throw new IllegalArgumentException(
              s"extractJsonPaths.$out path must be a string, got $other")
          }
          case _ => throw new IllegalArgumentException("extractJsonPaths needs paths{}")
        }
        ExtractJsonPaths(
          inputField = (body \ "inputField").extract[String],
          flatten = (body \ "flatten").extractOpt[Boolean].getOrElse(true),
          paths = paths)
      case JObject(List(("contains", JObject(fs)))) =>
        fs match {
          case List((field, v)) => ContainsCmd(field, literalValues("contains", field, v))
          case _ => throw new IllegalArgumentException(
            "contains needs exactly one field: {field: value | [values]}")
        }
      case JObject(List(("equals", JObject(fs)))) =>
        EqualsCmd(fs.map { case (k, v) => k -> literalValues("equals", k, v) })
      case JObject(List(("not", body))) =>
        NotCmd(parseCommand(body))
      case JObject(List(("decodeBase64", body))) =>
        DecodeBase64((body \ "field").extract[String])
      case JObject(List(("if", body))) =>
        // Kite form: conditions/then/else are command ARRAYS directly
        def chain(key: String): Seq[Command] = (body \ key) match {
          case org.json4s.JNothing => Nil
          case v => parseCommandList(v, s"if.$key")
        }
        IfThenElse(chain("conditions"), chain("then"), chain("else"))
      case JObject(List(("tryRules", body))) =>
        TryRules((body \ "rules") match {
          case JArray(rs) => rs.map(r => parseCommandList(r \ "commands", "tryRules rule"))
          case _ => throw new IllegalArgumentException("tryRules needs rules[]")
        })
      case other =>
        throw new IllegalArgumentException(s"unknown morphline command: $other")
    }
  }

  /** A Kite field literal: one string or an array of strings. */
  private def literalValues(cmd: String, field: String,
                            v: org.json4s.JValue): Seq[String] = {
    import org.json4s._
    v match {
      case JString(s) => Seq(s)
      case JArray(xs) => xs.map {
        case JString(s) => s
        case other => throw new IllegalArgumentException(
          s"$cmd.$field values must be strings, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"$cmd.$field needs a string or [strings], got $other")
    }
  }

  private val varRe = """\$\{([A-Za-z0-9_.-]+)\}""".r

  /** P11 `morphlineVariable.*` substitution: `${name}` placeholders in
    * the config text resolve from the variables map BEFORE parsing — the
    * reference substitutes indexer params into the HOCON config the same
    * way (LocalMorphlineResultToSolrMapper.java:96-127); an unresolved
    * variable fails at compile time, like HOCON resolution. */
  def substitute(json: String, vars: Map[String, String]): String =
    varRe.replaceAllIn(json, m =>
      scala.util.matching.Regex.quoteReplacement(
        vars.getOrElse(m.group(1), throw new IllegalArgumentException(
          s"unresolved morphline variable: $${${m.group(1)}}"))))

  /** The reference's full param contract (LocalMorphlineResultToSolrMapper
    * .java:96-160): `morphlineVariable.NAME=v` substitutes `${NAME}` in
    * the config; `morphlineField.FIELD=v` force-adds FIELD to every
    * record (before the chain runs, so sanitize sees it too). */
  def withParams(json: String, params: Map[String, String])(cells: Column): Column = {
    val vars = params.collect {
      case (k, v) if k.startsWith("morphlineVariable.") =>
        k.stripPrefix("morphlineVariable.") -> v
    }
    val forced = params.toSeq.collect {
      case (k, v) if k.startsWith("morphlineField.") => k.stripPrefix("morphlineField.") -> v
    }.sortBy(_._1)
    compile(parse(substitute(json, vars)), forced)(cells)
  }

  /** Compile the chain into a document expression over a `cells` column →
    * map<string, array<string>>. `forced` fields are present on every
    * record ahead of the sanitize/log commands. */
  def compile(commands: Seq[Command], forced: Seq[(String, String)] = Nil)(cells: Column): Column = {
    val doc = commands.collectFirst { case e: ExtractHBaseCells => e } match {
      case None => map_from_arrays(array(), array()).cast("map<string,array<string>>")
      case Some(e) =>
        // single + dynamic modes ride the standard mapping compiler
        val fieldDefs = e.mappings.flatMap { m =>
          m.outputField.map(name => m.toFieldDef(name))
        }
        val base = Mapping.docMap(IndexerConf(table = "*", fields = fieldDefs))(cells)

        // positional mode: i-th matched value (qualifier order) → the i-th
        // named output field; empty names skip their position
        // (ExtractHBaseCellsBuilder.java:210-221)
        val positional: Seq[(String, Column)] = e.mappings
          .filter(m => m.outputField.isEmpty && m.outputFields.nonEmpty)
          .flatMap { m =>
            val raw = Mapping.extractRaw(cells, m.toFieldDef("_pos*"))
            m.outputFields.zipWithIndex.collect {
              // try_element_at, NOT element_at: a row with fewer matched
              // cells than positional output fields must skip the missing
              // positions (reference ExtractHBaseCellsBuilder.java:210-221);
              // under ANSI mode (Spark 4 default) element_at would throw
              case (name, i) if name.nonEmpty => name -> try_element_at(raw, lit(i + 1))
            }
          }
        if (positional.isEmpty) base
        else map_concat(base,
          map_filter(
            map_from_arrays(
              array(positional.map(p => lit(p._1)): _*),
              array(positional.map(p => when(p._2.isNotNull, array(p._2))): _*)),
            (_, v) => v.isNotNull))
    }
    val withForced =
      if (forced.isEmpty) doc
      else let(doc)(d => mergeDocs(d, map_from_arrays(
        array(forced.map(f => lit(f._1)): _*),
        array(forced.map(f => array(lit(f._2))): _*))))
    commands.foldLeft(withForced)(applyCommand)
  }

  /** One post-extract command applied to a document expression — the
    * unit [[compile]]'s chain fold and [[TryRules]]' rule chains share. */
  private def applyCommand(d: Column, cmd: Command): Column = cmd match {
    case SanitizeUnknownFields(known) =>
      map_filter(d, (k, _) => k.isInCollection(known.map(lit(_))))
    // Kite iterates EVERY value of a multi-valued input field for
    // grok/split/convertTimestamp (like the round-8 URI/JSON extractors):
    // each value contributes independently and outputs accumulate in
    // value order.
    case Grok(in, pattern, outs) => let(d) { doc =>
      val vs = try_element_at(doc, lit(in))
      // per output group: one capture per MATCHING value (a non-matching
      // value contributes nothing); all values miss ⇒ no field, like
      // Kite grok on a total miss
      outs.zipWithIndex.collect { case (name, i) if name.nonEmpty =>
        name -> let(transform(filter(vs, v => v.rlike(pattern)),
            v => regexp_extract(v, pattern, i + 1))) { got =>
          when(vs.isNotNull && size(got) > 0, got)
        }
      }.foldLeft(doc) { case (dd, (name, value)) => putField(dd, name, value) }
    }
    case Split(in, out, sep, isRegex) => let(d) { doc =>
      val vs = try_element_at(doc, lit(in))
      val pat = if (isRegex) sep else java.util.regex.Pattern.quote(sep)
      putField(doc, out,
        when(vs.isNotNull, flatten(transform(vs, v => split(v, pat)))))
    }
    case ConvertTimestamp(field, inFmts, outFmt) => let(d) { doc =>
      val vs = try_element_at(doc, lit(field))
      val conv: Column => Column = v => {
        val ts = coalesce(inFmts.map(f => try_to_timestamp(v, lit(f))): _*)
        outFmt match {
          case "unixTimeInMillis" => unix_millis(ts).cast("string")
          case pattern => date_format(ts, pattern)
        }
      }
      // value-granularity failure: an unparseable value drops; all
      // values unparseable ⇒ the field clears (the single-value rule,
      // applied per value)
      putField(doc, field, let(filter(transform(vs, conv), c => c.isNotNull)) {
        got => when(vs.isNotNull && size(got) > 0, got)
      })
    }
    case Translate(field, dict, fallback) => let(d) { doc =>
      val vs = try_element_at(doc, lit(field))
      val table = map(dict.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      val rewrite: Column => Column = v => fallback match {
        case Some(fb) => coalesce(try_element_at(table, v), lit(fb))
        case None     => try_element_at(table, v)
      }
      // without a fallback a dictionary miss drops the value (and fails
      // the command as a rule condition — foldRule); with one it maps
      // to the fallback, Kite's exact contract
      putField(doc, field, let(filter(transform(vs, rewrite), c => c.isNotNull)) {
        got => when(vs.isNotNull && size(got) > 0, got)
      })
    }
    case SplitKeyValue(in, prefix, sep, doTrim) => let(d) { doc =>
      val vs = try_element_at(doc, lit(in))
      val emptyDoc = map_from_arrays(array(), array()).cast("map<string,array<string>>")
      // per value: split at the FIRST separator; values without one skip
      val rawPairs = transform(
        filter(vs, v => v.contains(sep)),
        v => {
          val key = substring_index(v, sep, 1)
          val rest = v.substr(length(key) + (sep.length + 1), length(v))
          struct(
            concat(lit(prefix), if (doTrim) trim(key) else key).as("k"),
            (if (doTrim) trim(rest) else rest).as("v"))
        })
      // group the pairs into a doc-shaped map (multimap per key, values
      // in input order) — field names are data values, so this cannot be
      // a static putField; let-bind pairs and keys, each feeds two
      // consumers (the Morphline.let cost rule)
      val kvDoc = let(rawPairs) { pairs =>
        let(array_distinct(transform(pairs, p => p.getField("k")))) { keys =>
          map_from_arrays(keys, transform(keys, k =>
            transform(filter(pairs, p => p.getField("k") === k),
              p => p.getField("v"))))
        }
      }
      mergeDocs(doc, coalesce(kvDoc, emptyDoc))
    }
    case FindReplace(f, pat, rep, isRegex) => let(d) { doc =>
      val vs = try_element_at(doc, lit(f))
      val rewrite: Column => Column =
        if (isRegex) v => regexp_replace(v, pat, rep)
        else v => replace(v, lit(pat), lit(rep)) // literal, codegen'd
      putField(doc, f, when(vs.isNotNull, transform(vs, rewrite)))
    }
    case RemoveFields(black) =>
      map_filter(d, (k, _) => !k.isInCollection(black.map(lit(_))))
    case SetValues(fields) =>
      fields.foldLeft(d) { case (doc, (f, vs)) =>
        putField(doc, f, array(vs.map(lit(_)): _*))
      }
    case AddValues(fields) =>
      mergeDocs(d, map_from_arrays(
        array(fields.map(f => lit(f._1)): _*),
        array(fields.map(f => array(f._2.map(lit(_)): _*)): _*)))
    case AddValuesIfAbsent(fields) =>
      fields.foldLeft(d) { case (doc0, (f, vs)) =>
        let(doc0) { doc =>
          // let-bind the current values: referenced by the containment
          // probe AND the concat
          putField(doc, f, let(coalesce(try_element_at(doc, lit(f)),
              array().cast("array<string>"))) { cur =>
            concat(cur, array_distinct(
              filter(array(vs.map(lit(_)): _*), v => !array_contains(cur, v))))
          })
        }
      }
    case RemoveValues(fields) =>
      fields.foldLeft(d) { case (doc0, (f, vs)) =>
        let(doc0) { doc =>
          val lits = array(vs.map(lit(_)): _*)
          // missing field: null propagates and putField leaves it absent;
          // an emptied field disappears (size-0 guard)
          putField(doc, f, let(filter(try_element_at(doc, lit(f)),
              v => !array_contains(lits, v))) { got =>
            when(got.isNotNull && size(got) > 0, got)
          })
        }
      }
    case ExtractUriComponents(in, prefix) => let(d) { doc =>
      // Kite iterates EVERY value of a multi-valued input field; each
      // URI's components append to the output fields in value order.
      val vs = try_element_at(doc, lit(in))
      // RFC-3986 generic syntax, componentwise; "" extracts = absent.
      // The query must be taken from the PRE-fragment substring: an
      // unanchored \?(...) on the full URI reads a '?' that first
      // appears inside the fragment (http://h/p#a?b) as a query, where
      // java.net.URI (Kite's parser) yields none.
      val comps: Seq[(String, Column => Column)] = Seq(
        "scheme" -> (v => regexp_extract(v, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)),
        "authority" -> (v => regexp_extract(v, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        "userInfo" -> (v => regexp_extract(v, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@]*)@", 1)),
        "host" -> (v => regexp_extract(v, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)),
        "port" -> (v => regexp_extract(v, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:(\\d+)", 1)),
        "path" -> (v => regexp_extract(v, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)),
        "query" -> (v => regexp_extract(regexp_extract(v, "^([^#]*)", 1), "\\?(.*)$", 1)),
        "fragment" -> (v => regexp_extract(v, "#(.*)$", 1)))
      comps.foldLeft(doc) { case (dd, (name, extract)) =>
        // let-bind the extracted array: referenced in both the emptiness
        // test and the field value — unbound it would extract twice
        putField(dd, prefix + name,
          let(filter(transform(vs, extract), c => length(c) > 0)) { got =>
            when(vs.isNotNull && size(got) > 0, got)
          })
      }
    }
    case ExtractUriQueryParams(in, param, out, maxP) => let(d) { doc =>
      val vs = try_element_at(doc, lit(in))
      val prefixLit = param + "="
      // per URI: pre-fragment query string → pairs split on '&' OR ';'
      // (both are Kite/URLEncodedUtils pair separators) → the values of
      // pairs named `param`, form-URL-decoded ('+' → space, %XX bytes —
      // try_url_decode so a malformed escape drops the value instead of
      // failing the row, Kite's lenient parse); a bare `param` token
      // with no '=' yields the empty string; a repeated parameter emits
      // one value per occurrence, in order (Kite's multimap semantics)
      val perValue: Column => Column = v =>
        filter(
          transform(
            split(regexp_extract(regexp_extract(v, "^([^#]*)", 1), "\\?(.*)$", 1), "[&;]"),
            kv => when(kv === lit(param), lit(""))
              .when(startswith(kv, lit(prefixLit)),
                try_url_decode(substring(kv, prefixLit.length + 1, Int.MaxValue)))),
          x => x.isNotNull)
      val all = flatten(transform(vs, perValue))
      val capped = if (maxP == Int.MaxValue) all else slice(all, 1, maxP)
      putField(doc, out, let(capped) { got =>
        when(vs.isNotNull && size(got) > 0, got)
      })
    }
    case ChangeCase(f, up) => let(d) { doc =>
      val vs = try_element_at(doc, lit(f))
      val rewrite: Column => Column = if (up) upper(_) else lower(_)
      putField(doc, f, when(vs.isNotNull, transform(vs, rewrite)))
    }
    case ExtractJsonPaths(in, doFlatten, paths) => let(d) { doc =>
      // Kite iterates EVERY value of a multi-valued input field; each
      // JSON document's extraction appends to the output field in order.
      val vs = try_element_at(doc, lit(in))
      paths.foldLeft(doc) { case (dd, (out, p)) =>
        // Kite slash path → JsonPath: /a/b → $.a.b ($ alone for "/")
        val jp = "$" + p.split("/").filter(_.nonEmpty).map("." + _).mkString
        // let-bind the parsed node per (value, path): `node` is referenced
        // three times below, and without the binding each reference
        // re-runs the JSON parse (measured 2× on the x30 bench)
        val perValue: Column => Column = v =>
          element_at(transform(array(get_json_object(v, jp)), node => {
            // an array node flattens via from_json (null for non-array
            // text, so scalars fall through coalesce to a single value)
            val value =
              if (doFlatten) coalesce(from_json(node, org.apache.spark.sql.types
                .ArrayType(org.apache.spark.sql.types.StringType)), array(node))
              else array(node)
            when(node.isNotNull, value).otherwise(array().cast("array<string>"))
          }), 1)
        // same double-reference trap as the URI components: bind the
        // flattened result before testing its size
        putField(dd, out, let(flatten(transform(vs, perValue))) { got =>
          when(vs.isNotNull && size(got) > 0, got)
        })
      }
    }
    case TryRules(rules) => let(d) { doc =>
      // first-match-wins over the SHARED let-bound input doc (N rules
      // cost one upstream evaluation). Acceptance is SEQUENTIAL, like
      // Kite running the rule on a record copy: each condition gates on
      // the doc state produced by the commands BEFORE it in the rule, so
      // a grok matching against a findReplace'd value sees the rewrite.
      // A rejected rule's partial effects are discarded (the `when`
      // takes the fallback branch), which is Kite's copy-rollback.
      rules.foldRight(doc) { (rule, fallback) =>
        val (endDoc, accepts) = foldRule(doc, rule)
        when(accepts, endDoc).otherwise(fallback)
      }
    }
    case IfThenElse(condCmds, thenCmds, elseCmds) => let(d) { doc =>
      val (condDoc, accepts) = foldRule(doc, condCmds)
      val thenDoc = thenCmds.foldLeft(condDoc)(applyCommand)
      val elseDoc = elseCmds.foldLeft(doc)(applyCommand) // copy-rollback
      when(accepts, thenDoc).otherwise(elseDoc)
    }
    case DecodeBase64(f) => let(d) { doc =>
      val vs = try_element_at(doc, lit(f))
      // try_to_binary: an undecodable value nulls (and drops) instead of
      // raising under ANSI — value-granular failure like convertTimestamp
      putField(doc, f, let(filter(
          transform(vs, v => try_to_binary(v, lit("base64")).cast("string")),
          c => c.isNotNull)) { got =>
        when(vs.isNotNull && size(got) > 0, got)
      })
    }
    case _: ContainsCmd => d // identity outside a condition position
    case _: EqualsCmd => d   // identity outside a condition position
    case _: NotCmd => d      // pure predicate; effects discarded
    case _ => d
  }

  /** Run a command chain over `doc`, conjoining the acceptance
    * predicates of its FAILING commands (grok non-match, contains miss)
    * — the unit [[TryRules]] rules and [[IfThenElse]] conditions share. */
  private def foldRule(doc: Column, cmds: Seq[Command]): (Column, Column) =
    cmds.foldLeft((doc, lit(true))) {
      case ((cur, cond), g: Grok) =>
        // Kite grok's default numRequiredMatches (atLeastOnce): the rule
        // accepts when ANY value of the input field matches
        val vs = coalesce(try_element_at(cur, lit(g.inputField)),
          array().cast("array<string>"))
        (applyCommand(cur, g), cond && exists(vs, v => v.rlike(g.pattern)))
      case ((cur, cond), c: ContainsCmd) =>
        val vs = coalesce(try_element_at(cur, lit(c.field)),
          array().cast("array<string>"))
        (cur, cond && arrays_overlap(vs, array(c.values.map(lit(_)): _*)))
      case ((cur, cond), e: EqualsCmd) =>
        // exact value-list equality per field (RecordEqualsBuilder);
        // a missing field never equals a non-empty literal list
        val ok = e.fields.map { case (f, vals) =>
          coalesce(try_element_at(cur, lit(f)), array().cast("array<string>")) ===
            array(vals.map(lit(_)): _*)
        }.reduce(_ && _)
        (cur, cond && ok)
      case ((cur, cond), NotCmd(inner)) =>
        // run the child as a predicate on the CURRENT doc; discard its
        // effects, invert its acceptance (Kite NotBuilder)
        val (_, innerCond) = foldRule(cur, Seq(inner))
        (cur, cond && !innerCond)
      case ((cur, cond), t: Translate) if t.fallback.isEmpty =>
        // fallback-less translate rejects the record on any miss
        val vs = coalesce(try_element_at(cur, lit(t.field)),
          array().cast("array<string>"))
        val table = map(t.dictionary.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
        (applyCommand(cur, t),
          cond && forall(vs, v => try_element_at(table, v).isNotNull))
      case ((cur, cond), c) => (applyCommand(cur, c), cond)
    }

  /** Let-binding for a document expression: each command stage references
    * its input doc several times (map_filter + lookups + merge), and a
    * naive fold would re-embed the full upstream expression at every
    * reference — multiplicities COMPOUND down a chain (an
    * extract→grok→split→convert chain re-evaluated the extract ~100× per
    * row; 28s at sf0.1 vs <1s let-bound). Binding the stage input as a
    * one-element `transform` lambda variable makes every in-stage
    * reference a cheap variable read, so chain cost is linear in its
    * length. */
  private def let(d: Column)(f: Column => Column): Column =
    element_at(transform(array(d), f), 1)

  /** First value of a document field (commands consume scalars; the
    * document's fields are multi-valued). try_element_at on both hops:
    * a missing field or empty value list is null, never an ANSI error. */
  private def firstValue(doc: Column, field: String): Column =
    try_element_at(try_element_at(doc, lit(field)), lit(1))

  /** Set `field` to `value` (array<string>): any existing entry is
    * replaced, a null value removes/omits the field. Built from
    * map_filter + map_concat over DISJOINT keys — never a duplicate-key
    * map, so the semantics hold under any `mapKeyDedupPolicy`. */
  private def putField(doc: Column, field: String, value: Column): Column =
    map_concat(
      map_filter(doc, (k, _) => k =!= field),
      map_filter(map_from_arrays(array(lit(field)), array(value)), (_, v) => v.isNotNull))

  /** Merge two documents by CONCATENATING the value lists of colliding
    * keys — the reference adds a forced `morphlineField.*` value alongside
    * the extracted values of the same field
    * (LocalMorphlineResultToSolrMapper.java:152-160), and relying on the
    * session's `mapKeyDedupPolicy=LAST_WIN` would instead replace them
    * (and THROW under Spark's default EXCEPTION policy). */
  private[morphline] def mergeDocs(a: Column, b: Column): Column =
    // let-bind BOTH maps: each is referenced once in array_union and once
    // PER KEY in the transform lambda — without the binding a computed
    // right side (splitKeyValue's grouping fold) re-evaluates for every
    // merged key (~8×/row; measured 35% of the whole x36 bench query)
    let(a) { aa =>
      let(b) { bb =>
        val keys = array_union(map_keys(aa), map_keys(bb))
        map_from_arrays(keys, transform(keys, k =>
          concat(
            coalesce(try_element_at(aa, k), array().cast("array<string>")),
            coalesce(try_element_at(bb, k), array().cast("array<string>")))))
      }
    }

  /** Parse + compile in one step. */
  def apply(json: String)(cells: Column): Column = compile(parse(json))(cells)
}
