package graft.mapping

/** P12-parity plug-in: the reference loads ANY `UniqueKeyFormatter` by
  * class name from the conf's `unique-key-formatter` attribute
  * (DefaultIndexerComponentFactory.java:100-104 loadClass; integration
  * test IndexerIT.java:605 testCustomKeyFormatter) — the built-ins
  * (string/hex) are just the two shipped implementations. This trait is
  * that surface (UniqueKeyFormatter.java:25-76): format the row id, a
  * family value, and the column-path row-family-qualifier id, plus the
  * row inverse (the reference uses it for one-row reindex addressing).
  *
  * Built-in formats never go through this trait — they stay compiled
  * Catalyst expressions ([[graft.expr.hfunctions.format_key]] /
  * `format_key_hex`). A custom class runs as a UDF, the same deliberate
  * trade as [[ValueMapper]]: a Catalyst expression cannot call user
  * classes by name, and the plug-in seam is worth the codegen break on
  * exactly the conf that asks for it. */
trait KeyFormatter extends Serializable {
  def formatRow(row: Array[Byte]): String
  def formatFamily(family: Array[Byte]): String
  /** Column-path id from (row, family, qualifier) — the reference's
    * formatKeyValue(KeyValue) with the KeyValue unpacked. */
  def formatKeyValue(row: Array[Byte], family: Array[Byte], qualifier: Array[Byte]): String
  /** Inverse of [[formatRow]] (one-row reindex addressing). */
  def unformatRow(formatted: String): Array[Byte]
}

object KeyFormatter {
  /** Reflective load by class name — unknown/mistyped classes fail at
    * conf-parse time, not per row (reference loadClass semantics). */
  def load(className: String): KeyFormatter =
    try Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[KeyFormatter]
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"unique-key-formatter: $className is not a loadable KeyFormatter", e)
    }
}

/** Demo plug-in (the tests' and queries' stand-in for a user class,
  * like [[SplitHashMapper]] / [[graft.core.UppercaseMapper]]): uppercase
  * hex with a 'k' prefix — visibly distinct from both built-ins, and
  * exactly invertible. */
class PrefixedHexKeyFormatter extends KeyFormatter {
  private def hex(bytes: Array[Byte]): String =
    "k" + bytes.map(b => f"$b%02X").mkString
  override def formatRow(row: Array[Byte]): String = hex(row)
  override def formatFamily(family: Array[Byte]): String = hex(family)
  override def formatKeyValue(row: Array[Byte], family: Array[Byte],
                              qualifier: Array[Byte]): String =
    s"${hex(row)}-${hex(family)}-${hex(qualifier)}"
  override def unformatRow(formatted: String): Array[Byte] = {
    require(formatted.startsWith("k"), s"not a prefixed-hex key: $formatted")
    formatted.drop(1).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }
}
