package graft.expr

import graft.SparkSpec
import graft.expr.hfunctions._
import org.apache.spark.sql.functions._

/** Property-style round-trips for the unique-key formatters (reference
  * BaseUniqueKeyFormatterTest): unformat(format(components)) == components
  * for keys containing hyphens, backslashes, and their combinations —
  * the reference's escaping edge cases (StringUniqueKeyFormatter.java:48-66). */
class KeyFormatSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)
  // NOTE: no backslash in the property alphabet — the reference's
  // escaping (StringUniqueKeyFormatter.java:48-66) escapes only '-', so a
  // component with '\' directly before a separator is genuinely lossy in
  // the reference too; we match that observable behavior (see the
  // interior-backslash case below for what does round-trip).
  private val alphabet = "ab-x-"

  private def randomComponent(): String =
    (0 until (1 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString

  test("string key format/unformat round-trips across hyphen edge cases") {
    import spark.implicits._
    val cases = (Seq(
      ("a", "b", "c"),
      ("a-b", "c-d", "e-f"),
      ("-", "--", "---"),
      ("a\\b", "cd", "x\\y"), // interior backslashes (not before '-') survive
      ("", "x", "")) ++
      Seq.fill(300)((randomComponent(), randomComponent(), randomComponent())))
    val df = cases.toDF("r", "f", "q")
      .withColumn("id", format_key(col("r"), col("f"), col("q")))
      .withColumn("back", unformat_key(col("id")))
    val bad = df.filter(
      element_at(col("back"), 1) =!= col("r") ||
      element_at(col("back"), 2) =!= col("f") ||
      element_at(col("back"), 3) =!= col("q")).collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("hex key format/unformat round-trips binary-safely") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"row-$i \u00ff").toDF("r")
      .withColumn("id", format_key_hex(col("r").cast("binary")))
      .withColumn("back", unformat_key_hex(col("id")).cast("string"))
    assert(df.filter(col("back") =!= col("r")).isEmpty)
  }

  test("custom key-formatter plug-in drives row AND cell ids end-to-end (IndexerIT testCustomKeyFormatter)") {
    import graft.conf.{IndexerConf, KeyFormat}
    import graft.mapping.{Mapping, PrefixedHexKeyFormatter}
    import spark.implicits._
    val conf = IndexerConf(table = "t",
      keyFormat = KeyFormat.parse("graft.mapping.PrefixedHexKeyFormatter"))
    val df = Seq(("row1", "fam", "qual"), ("r-2", "f", "q\u00e9"))
      .toDF("r", "f", "q")
      .withColumn("rowId", Mapping.formatRowKey(conf)(col("r"), lit("t")))
      .withColumn("cellId",
        Mapping.formatCellKey(conf)(col("r"), col("f"), col("q"), lit("t")))
    val got = df.select("rowId", "cellId").as[(String, String)].collect().toSeq
    val fmt = new PrefixedHexKeyFormatter
    def b(s: String) = s.getBytes("UTF-8")
    val expected = Seq(("row1", "fam", "qual"), ("r-2", "f", "q\u00e9")).map {
      case (r, f, q) => (fmt.formatRow(b(r)), fmt.formatKeyValue(b(r), b(f), b(q)))
    }
    assert(got == expected)
    // unformat inverts formatRow exactly, bytes included
    expected.foreach { case (rowId, _) =>
      assert(fmt.formatRow(fmt.unformatRow(rowId)) == rowId)
    }
  }
}
