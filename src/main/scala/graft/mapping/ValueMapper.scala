package graft.mapping

/** P5: the custom value-mapper plug-in — the reference accepts a CLASS
  * NAME as a field's `type` and reflectively instantiates a
  * `ByteArrayValueMapper` (/root/reference hbase-indexer-engine
  * .../parse/ByteArrayValueMappers.java:128-142). A mapper turns one
  * stored value into zero-or-more output values; malformed input yields
  * the empty collection (value dropped, row kept — the reference logs a
  * warning and returns empty, ByteArrayValueMappers.java:154-164; any
  * exception is treated the same way here).
  *
  * This is the VALUE-level plug-in (one field's decode step); the
  * record-level plug-in replacing the whole mapping stage is
  * [[graft.core.RecordMapper]] (P17). */
trait ValueMapper extends Serializable {
  def map(value: String): Seq[String]
}

object ValueMapper {
  /** Reflective load by class name, as the reference factory does —
    * unknown classes fail at conf-compile time, not per row. */
  def load(className: String): ValueMapper =
    try Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[ValueMapper]
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"unknown type: $className is neither a built-in type nor a loadable ValueMapper", e)
    }

  /** Total wrapper with the reference's malformed-drops-value contract. */
  def safeMap(m: ValueMapper, value: String): Seq[String] =
    if (value == null) Seq.empty
    else try m.map(value) catch { case _: Exception => Seq.empty }
}

/** Demo plug-in (the tests' and queries' stand-in for a user class):
  * splits `a#b#c` into its '#'-separated parts — multi-valued output —
  * and treats a value WITHOUT '#' as malformed (dropped). */
class SplitHashMapper extends ValueMapper {
  override def map(value: String): Seq[String] =
    if (value.contains("#")) value.split("#", -1).toSeq
    else throw new IllegalArgumentException(s"no '#' in: $value")
}
