package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip properties for the HBase Bytes codecs (seeded sampling),
  * mirroring the reference's ByteArrayValueMappersTest. Encoding facts
  * asserted against HBase's documented wire format (big-endian, boolean
  * true = -1, bigdecimal = 4-byte scale + unscaled BigInteger bytes).
  */
class HBaseCodecsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def samples[T](n: Int)(gen: => T): Seq[T] = Seq.fill(n)(gen)

  test("int round-trip + known encodings") {
    (samples(2000)(rnd.nextInt()) ++ Seq(0, 1, -1, Int.MinValue, Int.MaxValue)).foreach { v =>
      assert(HBaseCodecs.bytesToInt(HBaseCodecs.intToBytes(v)) == v)
    }
    assert(HBaseCodecs.intToBytes(1).toSeq == Seq[Byte](0, 0, 0, 1))
    assert(HBaseCodecs.intToBytes(-1).toSeq == Seq[Byte](-1, -1, -1, -1))
    assert(HBaseCodecs.intToBytes(0x01020304).toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("long round-trip") {
    (samples(2000)(rnd.nextLong()) ++ Seq(0L, Long.MinValue, Long.MaxValue)).foreach { v =>
      assert(HBaseCodecs.bytesToLong(HBaseCodecs.longToBytes(v)) == v)
    }
  }

  test("short round-trip") {
    (Short.MinValue to Short.MaxValue).foreach { i =>
      val v = i.toShort
      assert(HBaseCodecs.bytesToShort(HBaseCodecs.shortToBytes(v)) == v)
    }
  }

  test("float/double round-trip incl. specials") {
    samples(2000)(rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10)).foreach { v =>
      assert(HBaseCodecs.bytesToDouble(HBaseCodecs.doubleToBytes(v)) == v)
    }
    samples(2000)(rnd.nextFloat()).foreach { v =>
      assert(HBaseCodecs.bytesToFloat(HBaseCodecs.floatToBytes(v)) == v)
    }
    assert(HBaseCodecs.bytesToDouble(HBaseCodecs.doubleToBytes(Double.PositiveInfinity)).doubleValue.isPosInfinity)
    assert(HBaseCodecs.bytesToDouble(HBaseCodecs.doubleToBytes(Double.NaN)).isNaN)
  }

  test("boolean encoding: true = -1, false = 0 (HBase convention)") {
    assert(HBaseCodecs.booleanToBytes(true).toSeq == Seq[Byte](-1))
    assert(HBaseCodecs.booleanToBytes(false).toSeq == Seq[Byte](0))
    assert(HBaseCodecs.bytesToBoolean(Array[Byte](1)) == true) // any non-zero is true
  }

  test("string round-trip (UTF-8, incl. multibyte)") {
    Seq("", "abc", "héllo wörld", "日本語テキスト", "a-b\\c-d").foreach { v =>
      val b = HBaseCodecs.stringToBytes(org.apache.spark.unsafe.types.UTF8String.fromString(v))
      assert(HBaseCodecs.bytesToString(b) == v)
    }
  }

  test("bigdecimal round-trip: scale-prefixed unscaled bytes") {
    samples(500)((rnd.nextLong() % 100000000L, rnd.nextInt(11))).foreach { case (unscaled, scale) =>
      val v = new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), scale)
      assert(HBaseCodecs.bytesToBigDecimal(HBaseCodecs.bigDecimalToBytes(v)) == v)
    }
  }

  test("malformed input drops to null, never throws (reference ByteArrayValueMappers.java:154-164)") {
    assert(HBaseCodecs.bytesToInt(Array[Byte](1, 2)) == null)
    assert(HBaseCodecs.bytesToLong(Array[Byte](1)) == null)
    assert(HBaseCodecs.bytesToShort(Array[Byte](1, 2, 3)) == null)
    assert(HBaseCodecs.bytesToBoolean(Array[Byte](1, 2)) == null)
    assert(HBaseCodecs.bytesToBigDecimal(Array[Byte](1, 2, 3)) == null)
    assert(HBaseCodecs.bytesToInt(null) == null)
  }
}
