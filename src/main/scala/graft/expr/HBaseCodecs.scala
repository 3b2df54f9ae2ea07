package graft.expr

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.charset.StandardCharsets

/** Binary codecs matching HBase's `org.apache.hadoop.hbase.util.Bytes`
  * wire encoding (big-endian two's complement; float/double via IEEE-754
  * bits; bigdecimal as 4-byte scale + unscaled BigInteger bytes).
  *
  * Reference behavior: /root/reference hbase-indexer-engine
  * .../parse/ByteArrayValueMappers.java:33-126 — and its malformed-value
  * semantics at :154-164: a value of the wrong shape is DROPPED (we return
  * null), never an error.
  *
  * These are plain static helpers so the Catalyst expressions in
  * [[HBaseDecode]]/[[HBaseEncode]] can codegen a single function call and
  * stay inside whole-stage codegen.
  */
object HBaseCodecs {

  // ---- decode (Bytes.toXxx) ----

  def bytesToInt(b: Array[Byte]): java.lang.Integer =
    if (b == null || b.length != 4) null
    else java.lang.Integer.valueOf(
      ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) | ((b(2) & 0xff) << 8) | (b(3) & 0xff))

  def bytesToLong(b: Array[Byte]): java.lang.Long =
    if (b == null || b.length != 8) null
    else {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      java.lang.Long.valueOf(v)
    }

  def bytesToShort(b: Array[Byte]): java.lang.Short =
    if (b == null || b.length != 2) null
    else java.lang.Short.valueOf((((b(0) & 0xff) << 8) | (b(1) & 0xff)).toShort)

  def bytesToFloat(b: Array[Byte]): java.lang.Float = {
    val i = bytesToInt(b)
    if (i == null) null else java.lang.Float.valueOf(java.lang.Float.intBitsToFloat(i.intValue))
  }

  def bytesToDouble(b: Array[Byte]): java.lang.Double = {
    val l = bytesToLong(b)
    if (l == null) null else java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(l.longValue))
  }

  def bytesToBoolean(b: Array[Byte]): java.lang.Boolean =
    if (b == null || b.length != 1) null
    else java.lang.Boolean.valueOf(b(0) != 0)

  def bytesToString(b: Array[Byte]): String =
    if (b == null) null else new String(b, StandardCharsets.UTF_8)

  /** Bytes.toBigDecimal: first 4 bytes big-endian scale, remainder the
    * two's-complement unscaled BigInteger. Malformed (len < 5) → null. */
  def bytesToBigDecimal(b: Array[Byte]): JBigDecimal =
    if (b == null || b.length < 5) null
    else {
      val scale = bytesToInt(java.util.Arrays.copyOfRange(b, 0, 4)).intValue
      val unscaled = new BigInteger(java.util.Arrays.copyOfRange(b, 4, b.length))
      new JBigDecimal(unscaled, scale)
    }

  // ---- encode (Bytes.toBytes) ----

  def intToBytes(v: Int): Array[Byte] =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  def longToBytes(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 7
    var x = v
    while (i >= 0) { b(i) = x.toByte; x >>>= 8; i -= 1 }
    b
  }

  def shortToBytes(v: Short): Array[Byte] =
    Array[Byte]((v >>> 8).toByte, v.toByte)

  def floatToBytes(v: Float): Array[Byte] = intToBytes(java.lang.Float.floatToIntBits(v))

  def doubleToBytes(v: Double): Array[Byte] = longToBytes(java.lang.Double.doubleToLongBits(v))

  /** HBase encodes true as -1, false as 0. */
  def booleanToBytes(v: Boolean): Array[Byte] = Array[Byte](if (v) -1 else 0)

  def stringToBytes(v: org.apache.spark.unsafe.types.UTF8String): Array[Byte] =
    if (v == null) null else v.getBytes

  def bigDecimalToBytes(v: JBigDecimal): Array[Byte] =
    if (v == null) null
    else {
      val unscaled = v.unscaledValue.toByteArray
      val out = new Array[Byte](4 + unscaled.length)
      System.arraycopy(intToBytes(v.scale), 0, out, 0, 4)
      System.arraycopy(unscaled, 0, out, 4, unscaled.length)
      out
    }
}
