package graft.morphline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** P11: morphline variable substitution + forced fields (reference
  * LocalMorphlineResultToSolrMapper.java:96-160 and the
  * extractHBaseCellsWithVariables.conf fixture). */
class MorphlineSpec extends SparkSpec {

  private def cellsDf = {
    import spark.implicits._
    Seq(("r1", "alice")).toDF("rowKey", "v")
      .select(col("rowKey"), array(struct(
        lit("info").as("family"), lit("name").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
  }

  private val chain =
    """{"commands": [
      |  {"extractHBaseCells": {"mappings": [
      |    {"inputColumn": "${cf}:name", "outputField": "name_s", "type": "string"}]}}
      |]}""".stripMargin

  private def docOf(params: Map[String, String], json: String = chain) =
    cellsDf.select(Morphline.withParams(json, params)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)

  test("morphlineVariable.* substitutes ${var} in the chain config") {
    val doc = docOf(Map("morphlineVariable.cf" -> "info"))
    assert(doc.get("name_s").map(_.toList).contains(List("alice")))
  }

  test("unresolved variables fail at compile time") {
    val e = intercept[IllegalArgumentException] { docOf(Map.empty) }
    assert(e.getMessage.contains("${cf}"))
  }

  test("morphlineField.* force-adds fields to every record") {
    val doc = docOf(Map(
      "morphlineVariable.cf" -> "info", "morphlineField.source_s" -> "hbase"))
    assert(doc.get("source_s").map(_.toList).contains(List("hbase")))
  }

  test("a ValueMapper class name works as a morphline mapping type (P10 × P5)") {
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:name", "outputField": "parts",
        |     "type": "graft.mapping.SplitHashMapper"}]}}
        |]}""".stripMargin
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val doc = Seq(("r1", "x#y")).toDF("rowKey", "v")
      .select(col("rowKey"), array(struct(
        lit("info").as("family"), lit("name").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
      .select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.get("parts").map(_.toList).contains(List("x", "y")))
  }

  test("positional mode skips missing positions under ANSI mode (never throws)") {
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:q*", "outputFields": ["f1", "f2", "f3"], "type": "string"}]}}
        |]}""".stripMargin
    // only ONE matching cell — positions 2 and 3 are absent, not errors
    val doc = cellsDf
      .select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.isEmpty, "info:q* matches nothing here — no fields, no throw")

    val chain2 = chain.replace("info:q*", "info:n*")
    val doc2 = cellsDf
      .select(Morphline(chain2)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc2.get("f1").map(_.toList).contains(List("alice")))
    assert(!doc2.contains("f2") && !doc2.contains("f3"))
  }

  test("a forced field colliding with an extracted field ADDS alongside, not replaces") {
    // reference semantics: morphlineField.name_s lands NEXT TO the
    // extracted values in the multi-valued field — and the merge must not
    // depend on the session's mapKeyDedupPolicy
    val doc = docOf(Map(
      "morphlineVariable.cf" -> "info", "morphlineField.name_s" -> "forced"))
    assert(doc.get("name_s").map(_.toList).contains(List("alice", "forced")), doc)
  }

  test("grok extracts numbered groups; a non-matching record gains nothing") {
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:name", "outputField": "raw", "type": "string"}]}},
        |  {"grok": {"inputField": "raw", "pattern": "^([a-z]+)(ce)$",
        |            "outputFields": ["stem", "suffix"]}}
        |]}""".stripMargin
    val doc = cellsDf.select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.get("stem").map(_.toList).contains(List("ali")), doc)
    assert(doc.get("suffix").map(_.toList).contains(List("ce")), doc)

    val miss = chain.replace("^([a-z]+)(ce)$", "^(\\\\d+)(x)$")
    val doc2 = cellsDf.select(Morphline(miss)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(!doc2.contains("stem") && !doc2.contains("suffix"), doc2)
  }

  test("split fans a field into a multi-valued output; convertTimestamp re-renders in place") {
    import spark.implicits._
    val cells = Seq(("r1", "a,b,c", "2024-03-01 10:15:00")).toDF("rowKey", "csv", "when")
      .select(col("rowKey"), array(
        struct(lit("info").as("family"), lit("csv").as("qualifier"),
          lit(0L).as("ts"), lit("put").as("cellType"), col("csv").as("value")),
        struct(lit("info").as("family"), lit("when").as("qualifier"),
          lit(0L).as("ts"), lit("put").as("cellType"), col("when").as("value"))).as("cells"))
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:csv", "outputField": "csv", "type": "string"},
        |    {"inputColumn": "info:when", "outputField": "when", "type": "string"}]}},
        |  {"split": {"inputField": "csv", "outputField": "parts", "separator": ","}},
        |  {"convertTimestamp": {"field": "when",
        |     "inputFormats": ["yyyy-MM-dd HH:mm:ss", "yyyy/MM/dd"],
        |     "outputFormat": "unixTimeInMillis"}}
        |]}""".stripMargin
    val doc = cells.select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.get("parts").map(_.toList).contains(List("a", "b", "c")), doc)
    assert(doc.get("when").map(_.toList).contains(List("1709288100000")), doc)
    // a literal separator is NOT a regex: '.' must split on dots only
    val dot = Seq(("r1", "a.b")).toDF("rowKey", "v")
      .select(col("rowKey"), array(struct(
        lit("info").as("family"), lit("x").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
    val dotChain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:x", "outputField": "x", "type": "string"}]}},
        |  {"split": {"inputField": "x", "outputField": "px", "separator": "."}}
        |]}""".stripMargin
    val dotDoc = dot.select(Morphline(dotChain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(dotDoc.get("px").map(_.toList).contains(List("a", "b")), dotDoc)
  }

  test("findReplace rewrites every value (literal and regex); removeFields drops by blacklist") {
    import spark.implicits._
    val cells = Seq(("r1", "a.b,c.d")).toDF("rowKey", "v")
      .select(col("rowKey"), array(struct(
        lit("info").as("family"), lit("x").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:x", "outputField": "x", "type": "string"}]}},
        |  {"split": {"inputField": "x", "outputField": "parts", "separator": ","}},
        |  {"findReplace": {"field": "parts", "pattern": ".", "replacement": "_"}},
        |  {"findReplace": {"field": "parts", "isRegex": true,
        |     "pattern": "^[a-z]", "replacement": "Z"}},
        |  {"findReplace": {"field": "absent", "pattern": "a", "replacement": "b"}},
        |  {"removeFields": {"blacklist": ["x"]}}
        |]}""".stripMargin
    val doc = cells.select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    // literal '.' is NOT a regex (a_b, c_d); regex pass then hits the
    // first letter of EACH value — multi-valued rewrite, not just head
    assert(doc.get("parts").map(_.toList).contains(List("Z_b", "Z_d")), doc)
    assert(!doc.contains("x"), "removeFields must drop the blacklisted field")
    assert(!doc.contains("absent"), "findReplace on a missing field must not create it")
  }

  test("tryRules: no accepting rule leaves the record unchanged; rules see pre-tryRules state") {
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:name", "outputField": "name_s", "type": "string"}]}},
        |  {"tryRules": {"rules": [
        |    {"commands": [
        |      {"grok": {"inputField": "name_s", "pattern": "^nomatch$",
        |                "outputFields": ["g"]}},
        |      {"findReplace": {"field": "name_s", "pattern": "alice", "replacement": "X"}}]},
        |    {"commands": [
        |      {"grok": {"inputField": "name_s", "pattern": "^zz$",
        |                "outputFields": ["g"]}}]}
        |  ]}}
        |]}""".stripMargin
    val doc = cellsDf.select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.get("name_s").map(_.toList).contains(List("alice")),
      s"no rule accepted 'alice' — the record must pass through untouched: $doc")
    assert(!doc.contains("g"), s"rejected rules must not leave fields behind: $doc")
  }

  test("extractJsonPaths: nested scalars, flattened arrays, absent nodes, flatten=false") {
    import spark.implicits._
    val jsonCells = Seq(("r1",
      """{"name":"alice","meta":{"segment":"gold"},"tags":["a","b"],"n":7}"""))
      .toDF("rowKey", "v")
      .select(col("rowKey"), array(struct(
        lit("info").as("family"), lit("js").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
    def run(flatten: Boolean) = {
      val chain =
        s"""{"commands": [
           |  {"extractHBaseCells": {"mappings": [
           |    {"inputColumn": "info:js", "outputField": "js"}]}},
           |  {"extractJsonPaths": {"inputField": "js", "flatten": $flatten,
           |    "paths": {"name_s": "/name", "seg_s": "/meta/segment",
           |              "tag_ss": "/tags", "n_i": "/n", "gone": "/missing/node"}}}
           |]}""".stripMargin
      jsonCells.select(Morphline(chain)(col("cells")).as("doc"))
        .collect().head.getMap[String, scala.collection.Seq[String]](0)
    }
    val doc = run(flatten = true)
    assert(doc.get("name_s").map(_.toList).contains(List("alice")))
    assert(doc.get("seg_s").map(_.toList).contains(List("gold")),
      s"a /nested/path must reach into objects: $doc")
    assert(doc.get("tag_ss").map(_.toList).contains(List("a", "b")),
      s"flatten must emit one value per array element: $doc")
    assert(doc.get("n_i").map(_.toList).contains(List("7")))
    assert(!doc.contains("gone"), s"an absent node must add no field: $doc")
    val unflat = run(flatten = false)
    assert(unflat.get("tag_ss").map(_.toList).contains(List("""["a","b"]""")),
      s"flatten=false keeps the array node as one JSON-text value: $unflat")
  }

  test("extractURIComponents: RFC components by field; absent parts add no field; case commands") {
    import spark.implicits._
    val uriCells = Seq(("r1", "HTTPS://User@Sub.Host.COM:8443/a/b?x=1&y=2#frag"),
        ("r2", "http://plain.org/p"))
      .toDF("rowKey", "v")
      .select(col("rowKey"), array(struct(
        lit("info").as("family"), lit("url").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:url", "outputField": "u"}]}},
        |  {"extractURIComponents": {"inputField": "u", "outputFieldPrefix": "uri_"}},
        |  {"toLowerCase": {"field": "uri_host"}},
        |  {"toUpperCase": {"field": "uri_scheme"}}
        |]}""".stripMargin
    val docs = uriCells.select(col("rowKey"), Morphline(chain)(col("cells")).as("doc"))
      .collect().map(r => r.getString(0) ->
        r.getMap[String, scala.collection.Seq[String]](1)).toMap
    val d1 = docs("r1")
    assert(d1.get("uri_scheme").map(_.toList).contains(List("HTTPS")))
    assert(d1.get("uri_host").map(_.toList).contains(List("sub.host.com")),
      s"host must drop userinfo/port and lowercase: $d1")
    assert(d1.get("uri_port").map(_.toList).contains(List("8443")))
    assert(d1.get("uri_path").map(_.toList).contains(List("/a/b")))
    assert(d1.get("uri_query").map(_.toList).contains(List("x=1&y=2")))
    assert(d1.get("uri_fragment").map(_.toList).contains(List("frag")))
    val d2 = docs("r2")
    assert(d2.get("uri_path").map(_.toList).contains(List("/p")))
    assert(!d2.contains("uri_port") && !d2.contains("uri_query") &&
      !d2.contains("uri_fragment"),
      s"absent components must add no fields: $d2")
    // userInfo and authority (java.net.URI component set)
    assert(d1.get("uri_userInfo").map(_.toList).contains(List("User")))
    assert(d1.get("uri_authority").map(_.toList)
      .contains(List("User@Sub.Host.COM:8443")))
    assert(!d2.contains("uri_userInfo"), s"no userinfo → no field: $d2")
  }

  test("extractURIComponents: '?' inside the fragment is NOT a query; multi-valued inputs iterate") {
    import spark.implicits._
    // java.net.URI parses http://h/p#a?b as fragment "a?b", query absent —
    // an unanchored \?(...) regex would wrongly extract query "b"
    val cells = Seq(("r1", Seq("http://h/p#a?b")),
        ("r2", Seq("http://one.org/a?q=1", "https://two.org:99/b#f")))
      .toDF("rowKey", "vs")
      .select(col("rowKey"), transform(col("vs"), v => struct(
        lit("info").as("family"), lit("url").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), v.as("value"))).as("cells"))
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:url", "outputField": "u"}]}},
        |  {"extractURIComponents": {"inputField": "u", "outputFieldPrefix": "uri_"}}
        |]}""".stripMargin
    val docs = cells.select(col("rowKey"), Morphline(chain)(col("cells")).as("doc"))
      .collect().map(r => r.getString(0) ->
        r.getMap[String, scala.collection.Seq[String]](1)).toMap
    val d1 = docs("r1")
    assert(!d1.contains("uri_query"),
      s"a '?' first appearing inside the fragment is not a query: $d1")
    assert(d1.get("uri_fragment").map(_.toList).contains(List("a?b")))
    // Kite iterates every value of a multi-valued input field: components
    // accumulate across the two URIs in value order
    val d2 = docs("r2")
    assert(d2.get("uri_host").map(_.toList).contains(List("one.org", "two.org")), s"$d2")
    assert(d2.get("uri_query").map(_.toList).contains(List("q=1")),
      s"only the first URI has a query — one accumulated value: $d2")
    assert(d2.get("uri_port").map(_.toList).contains(List("99")))
    assert(d2.get("uri_fragment").map(_.toList).contains(List("f")))
  }

  test("extractURIQueryParameters: repeats in order, maxParameters cap, fragment immune") {
    import spark.implicits._
    val cells = Seq(("r1", Seq(
        "http://a.org/p?k=1&j=9&k=2#f?k=zz",
        "http://b.org/q?k=3")))
      .toDF("rowKey", "vs")
      .select(col("rowKey"), transform(col("vs"), v => struct(
        lit("info").as("family"), lit("url").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), v.as("value"))).as("cells"))
    def run(max: String) = {
      val chain =
        s"""{"commands": [
           |  {"extractHBaseCells": {"mappings": [
           |    {"inputColumn": "info:url", "outputField": "u"}]}},
           |  {"extractURIQueryParameters":
           |    {"parameter": "k", "inputField": "u", "outputField": "k_ss"$max}},
           |  {"extractURIQueryParameters":
           |    {"parameter": "nope", "inputField": "u", "outputField": "gone"}}
           |]}""".stripMargin
      cells.select(Morphline(chain)(col("cells")).as("doc"))
        .collect().head.getMap[String, scala.collection.Seq[String]](0)
    }
    val doc = run("")
    assert(doc.get("k_ss").map(_.toList).contains(List("1", "2", "3")),
      s"repeats across values accumulate in order, fragment 'k=zz' excluded: $doc")
    assert(!doc.contains("gone"), s"an absent parameter adds no field: $doc")
    val capped = run(""", "maxParameters": 2""")
    assert(capped.get("k_ss").map(_.toList).contains(List("1", "2")),
      s"maxParameters caps the accumulated list: $capped")
  }

  test("extractURIQueryParameters: URL-decodes values, splits on ';', bare key is empty string") {
    import spark.implicits._
    val cells = Seq(("r1",
        "http://a.org/p?q=a%20b+c;q=x%2By&flag&bad=%ZZ#f?q=no"))
      .toDF("rowKey", "v")
      .select(col("rowKey"), array(struct(
        lit("info").as("family"), lit("url").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:url", "outputField": "u"}]}},
        |  {"extractURIQueryParameters":
        |    {"parameter": "q", "inputField": "u", "outputField": "q_ss"}},
        |  {"extractURIQueryParameters":
        |    {"parameter": "flag", "inputField": "u", "outputField": "flag_ss"}},
        |  {"extractURIQueryParameters":
        |    {"parameter": "bad", "inputField": "u", "outputField": "bad_ss"}}
        |]}""".stripMargin
    val doc = cells.select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.get("q_ss").map(_.toList).contains(List("a b c", "x+y")),
      s"%20 and '+' decode to space, %2B to '+', ';' separates pairs: $doc")
    assert(doc.get("flag_ss").map(_.toList).contains(List("")),
      s"a bare key with no '=' is a present, empty-string parameter: $doc")
    assert(!doc.contains("bad_ss"),
      s"a malformed escape drops the value (lenient parse), not the row: $doc")
  }

  test("splitKeyValue: first-separator split, trim, multimap accumulation, separator-less skip") {
    import spark.implicits._
    val cells = Seq(("r1",
        Seq("a = 1 = x", " color =red", "color= blue", "plain", "k=", "=v")))
      .toDF("rowKey", "vs")
      .select(col("rowKey"), transform(col("vs"), v => struct(
        lit("info").as("family"), lit("v").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), v.as("value"))).as("cells"))
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:v", "outputField": "kv"}]}},
        |  {"splitKeyValue": {"inputField": "kv", "outputFieldPrefix": "p_"}},
        |  {"splitKeyValue": {"inputField": "nosuch", "outputFieldPrefix": "q_"}}
        |]}""".stripMargin
    val doc = cells.select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.get("p_a").map(_.toList).contains(List("1 = x")),
      s"split happens at the FIRST separator only: $doc")
    assert(doc.get("p_color").map(_.toList).contains(List("red", "blue")),
      s"a repeated key accumulates values in input order (multimap): $doc")
    assert(doc.get("p_k").map(_.toList).contains(List("")),
      s"'k=' yields an empty-string value: $doc")
    assert(doc.get("p_").map(_.toList).contains(List("v")),
      s"'=v' yields the bare-prefix field: $doc")
    assert(!doc.contains("p_plain"),
      s"a value without the separator contributes nothing: $doc")
    assert(!doc.keysIterator.exists(_.startsWith("q_")),
      s"a missing input field adds no fields: $doc")
  }

  test("addValuesIfAbsent/removeValues: put-if-absent, every-occurrence removal, empty-field collapse") {
    import spark.implicits._
    val cells = Seq(("r1", Seq("x", "y", "x"))).toDF("rowKey", "vs")
      .select(col("rowKey"), transform(col("vs"), v => struct(
        lit("info").as("family"), lit("v").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), v.as("value"))).as("cells"))
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:v", "outputField": "tags"}]}},
        |  {"addValuesIfAbsent": {"tags": ["x", "z", "z"], "fresh": ["n", "n"]}},
        |  {"removeValues": {"tags": ["y"], "absent": ["q"]}},
        |  {"setValues": {"tmp": ["a", "b"]}},
        |  {"removeValues": {"tmp": ["b", "a"]}}
        |]}""".stripMargin
    val doc = cells.select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.get("tags").map(_.toList).contains(List("x", "x", "z")),
      s"'x' already present adds nothing (existing dup untouched), 'z' adds ONCE, 'y' removed: $doc")
    assert(doc.get("fresh").map(_.toList).contains(List("n")),
      s"if-absent on a missing field creates it, repeated literal collapses: $doc")
    assert(!doc.contains("tmp"), s"a field emptied by removeValues disappears: $doc")
    assert(!doc.contains("absent"), s"removeValues on a missing field stays missing: $doc")
  }

  test("splitKeyValue: custom separator without trim preserves spacing") {
    import spark.implicits._
    val cells = Seq(("r1", "host : db01 :ro"))
      .toDF("rowKey", "v")
      .select(col("rowKey"), array(struct(
        lit("info").as("family"), lit("cfg").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:cfg", "outputField": "cfg"}]}},
        |  {"splitKeyValue": {"inputField": "cfg", "separator": ":", "trim": false}}
        |]}""".stripMargin
    val doc = cells.select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.get("host ").map(_.toList).contains(List(" db01 :ro")),
      s"trim=false keeps both sides verbatim; the split is still first-separator: $doc")
  }

  test("grok/split/convertTimestamp iterate every value of a multi-valued field") {
    import spark.implicits._
    val cells = Seq(("r1", Seq("alpha#1", "42", "beta#7"))).toDF("rowKey", "vs")
      .select(col("rowKey"), transform(col("vs"), v => struct(
        lit("info").as("family"), lit("v").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), v.as("value"))).as("cells"))
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:v", "outputField": "raw"}]}},
        |  {"grok": {"inputField": "raw", "pattern": "^([a-z]+)#(\\d+)$",
        |            "outputFields": ["word", "num"]}},
        |  {"split": {"inputField": "raw", "outputField": "parts", "separator": "#"}},
        |  {"setValues": {"times": ["2024-03-01 10:15:00", "nope"]}},
        |  {"convertTimestamp": {"field": "times",
        |     "inputFormats": ["yyyy-MM-dd HH:mm:ss"], "outputFormat": "unixTimeInMillis"}}
        |]}""".stripMargin
    val doc = cells.select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.get("word").map(_.toList).contains(List("alpha", "beta")),
      s"grok captures from every MATCHING value, misses contribute nothing: $doc")
    assert(doc.get("num").map(_.toList).contains(List("1", "7")), s"$doc")
    assert(doc.get("parts").map(_.toList).contains(
      List("alpha", "1", "42", "beta", "7")),
      s"split fans out every value in order: $doc")
    assert(doc.get("times").map(_.toList).contains(List("1709288100000")),
      s"convertTimestamp renders each parseable value, drops the rest: $doc")
  }

  test("translate: dictionary + fallback per value; fallback-less miss fails the rule") {
    import spark.implicits._
    val cells = Seq(("r1", Seq("red", "mauve", "blue"))).toDF("rowKey", "vs")
      .select(col("rowKey"), transform(col("vs"), v => struct(
        lit("info").as("family"), lit("v").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), v.as("value"))).as("cells"))
    def run(extra: String) = {
      val chain =
        s"""{"commands": [
           |  {"extractHBaseCells": {"mappings": [
           |    {"inputColumn": "info:v", "outputField": "c"}]}},
           |  $extra
           |]}""".stripMargin
      cells.select(Morphline(chain)(col("cells")).as("doc"))
        .collect().head.getMap[String, scala.collection.Seq[String]](0)
    }
    val withFb = run(
      """{"translate": {"field": "c",
        |   "dictionary": {"red": "#f00", "blue": "#00f"}, "fallback": "#000"}}""".stripMargin)
    assert(withFb.get("c").map(_.toList).contains(List("#f00", "#000", "#00f")),
      s"fallback substitutes per missing value: $withFb")
    val noFb = run(
      """{"translate": {"field": "c",
        |   "dictionary": {"red": "#f00", "blue": "#00f"}}}""".stripMargin)
    assert(noFb.get("c").map(_.toList).contains(List("#f00", "#00f")),
      s"without a fallback a miss drops the value: $noFb")
    // as a rule condition: the miss rejects rule 1, the record falls to
    // the catch-all rule UNCHANGED (rollback of rule 1's rewrite)
    val ruled = run(
      """{"tryRules": {"rules": [
        |  {"commands": [
        |    {"translate": {"field": "c",
        |       "dictionary": {"red": "#f00", "blue": "#00f"}}}]},
        |  {"commands": [{"setValues": {"verdict": "untranslatable"}}]}
        |]}}""".stripMargin)
    assert(ruled.get("c").map(_.toList).contains(List("red", "mauve", "blue")) &&
      ruled.get("verdict").map(_.toList).contains(List("untranslatable")),
      s"a fallback-less miss fails the rule and rolls its rewrite back: $ruled")
  }

  test("extractJsonPaths: multi-valued input fields iterate and accumulate") {
    import spark.implicits._
    val cells = Seq(("r1", Seq(
        """{"name":"alice","tags":["a","b"]}""",
        """{"name":"bob","tags":["c"]}""")))
      .toDF("rowKey", "vs")
      .select(col("rowKey"), transform(col("vs"), v => struct(
        lit("info").as("family"), lit("js").as("qualifier"),
        lit(0L).as("ts"), lit("put").as("cellType"), v.as("value"))).as("cells"))
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:js", "outputField": "js"}]}},
        |  {"extractJsonPaths": {"inputField": "js", "flatten": true,
        |    "paths": {"name_s": "/name", "tag_ss": "/tags", "gone": "/nope"}}}
        |]}""".stripMargin
    val doc = cells.select(Morphline(chain)(col("cells")).as("doc"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(doc.get("name_s").map(_.toList).contains(List("alice", "bob")), s"$doc")
    assert(doc.get("tag_ss").map(_.toList).contains(List("a", "b", "c")),
      s"flattened arrays accumulate across values: $doc")
    assert(!doc.contains("gone"), s"absent in every value → no field: $doc")
  }

  test("if/contains: then sees condition-transformed doc, else sees the original (rollback)") {
    import spark.implicits._
    def run(name: String) = {
      val cells = Seq(("r", name)).toDF("rowKey", "v")
        .select(col("rowKey"), array(struct(
          lit("info").as("family"), lit("name").as("qualifier"),
          lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
      val chain =
        """{"commands": [
          |  {"extractHBaseCells": {"mappings": [
          |    {"inputColumn": "info:name", "outputField": "name_s"}]}},
          |  {"if": {
          |    "conditions": [
          |      {"findReplace": {"field": "name_s", "pattern": "al", "replacement": "AL"}},
          |      {"contains": {"name_s": ["ALice", "ALfred"]}}
          |    ],
          |    "then": [{"setValues": {"route": "vip"}}],
          |    "else": [{"setValues": {"route": "bulk"}}]
          |  }}
          |]}""".stripMargin
      cells.select(Morphline(chain)(col("cells")).as("doc"))
        .collect().head.getMap[String, scala.collection.Seq[String]](0)
    }
    val hit = run("alice")
    assert(hit.get("route").map(_.toList).contains(List("vip")))
    assert(hit.get("name_s").map(_.toList).contains(List("ALice")),
      s"then must see the condition-transformed doc: $hit")
    val miss = run("bob")
    assert(miss.get("route").map(_.toList).contains(List("bulk")))
    assert(miss.get("name_s").map(_.toList).contains(List("bob")),
      s"else must see the ORIGINAL doc (condition effects rolled back): $miss")
  }

  test("forced fields pass through sanitizeUnknownSolrFields like any record field") {
    val sanitized =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:name", "outputField": "name_s", "type": "string"}]}},
        |  {"sanitizeUnknownSolrFields": {"knownFields": ["name_s"]}}
        |]}""".stripMargin
    val doc = docOf(Map("morphlineField.junk_s" -> "x"), sanitized)
    assert(doc.contains("name_s") && !doc.contains("junk_s"),
      "sanitize must filter a forced field that is not in the schema")
  }

  test("decodeBase64: per-value decode, undecodable values drop, all-bad field clears") {
    val chain =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:name", "outputField": "name_s", "type": "string"}]}},
        |  {"setValues": {"good": ["aGVsbG8=", "d29ybGQ="],
        |                 "mixed": ["b2s=", "***"],
        |                 "bad": ["%%%"]}},
        |  {"decodeBase64": {"field": "good"}},
        |  {"decodeBase64": {"field": "mixed"}},
        |  {"decodeBase64": {"field": "bad"}},
        |  {"decodeBase64": {"field": "absent"}}
        |]}""".stripMargin
    val doc = docOf(Map.empty, chain)
    assert(doc.get("good").map(_.toList).contains(List("hello", "world")))
    assert(doc.get("mixed").map(_.toList).contains(List("ok")),
      s"undecodable value must drop at value granularity: $doc")
    assert(!doc.contains("bad"), s"an all-undecodable field must clear: $doc")
    assert(!doc.contains("absent"), "decoding a missing field must not create it")
  }

  test("equals: exact value-LIST match (order and arity count); missing field never matches") {
    def route(vals: String) = {
      val chain =
        s"""{"commands": [
           |  {"extractHBaseCells": {"mappings": [
           |    {"inputColumn": "info:name", "outputField": "name_s", "type": "string"}]}},
           |  {"setValues": {"tags": $vals}},
           |  {"if": {
           |    "conditions": [{"equals": {"tags": ["a", "b"]}}],
           |    "then": [{"setValues": {"r": "hit"}}],
           |    "else": [{"setValues": {"r": "miss"}}]}}
           |]}""".stripMargin
      docOf(Map.empty, chain).get("r").map(_.toList)
    }
    assert(route("""["a", "b"]""").contains(List("hit")))
    assert(route("""["b", "a"]""").contains(List("miss")), "order-sensitive")
    assert(route("""["a", "b", "c"]""").contains(List("miss")), "arity-sensitive")
    assert(route("""["a"]""").contains(List("miss")))
    // missing field vs non-empty literal list
    val chain2 =
      """{"commands": [
        |  {"extractHBaseCells": {"mappings": [
        |    {"inputColumn": "info:name", "outputField": "name_s", "type": "string"}]}},
        |  {"if": {
        |    "conditions": [{"equals": {"nope": ["x"]}}],
        |    "then": [{"setValues": {"r": "hit"}}],
        |    "else": [{"setValues": {"r": "miss"}}]}}
        |]}""".stripMargin
    assert(docOf(Map.empty, chain2).get("r").map(_.toList).contains(List("miss")))
  }

  test("not: inverts a condition; effects of the wrapped command are discarded") {
    def run(name: String) = {
      import spark.implicits._
      val cells = Seq(("r1", name)).toDF("rowKey", "v")
        .select(col("rowKey"), array(struct(
          lit("info").as("family"), lit("name").as("qualifier"),
          lit(0L).as("ts"), lit("put").as("cellType"), col("v").as("value"))).as("cells"))
      val chain =
        """{"commands": [
          |  {"extractHBaseCells": {"mappings": [
          |    {"inputColumn": "info:name", "outputField": "name_s", "type": "string"}]}},
          |  {"tryRules": {"rules": [
          |    {"commands": [
          |      {"not": {"contains": {"name_s": ["alice"]}}},
          |      {"setValues": {"r": "not-alice"}}]},
          |    {"commands": [{"setValues": {"r": "alice"}}]}
          |  ]}}
          |]}""".stripMargin
      cells.select(Morphline(chain)(col("cells")).as("doc"))
        .collect().head.getMap[String, scala.collection.Seq[String]](0)
    }
    assert(run("alice").get("r").map(_.toList).contains(List("alice")))
    assert(run("carol").get("r").map(_.toList).contains(List("not-alice")))
    // not(grok): the wrapped grok's capture effects must NOT land
    val g = run("zz9")
    assert(g.get("r").map(_.toList).contains(List("not-alice")))
  }
}
