package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values synopsis: the k smallest DISTINCT hash values seen,
  * kept as a sorted array with binary-search insert (k is sketch-sized —
  * tens to hundreds — so the O(k) shift is cache-local and cheap next to
  * the hash evaluation feeding it). Deduplication happens INSIDE the
  * bounded buffer, which is the whole point: a `count(distinct h)` needs
  * a corpus-volume (group, h) shuffle, while this sketch's partials merge
  * map-side and the exchange carries ≤ groups × k longs. */
final class KmvBuffer(val k: Int) {
  val vals = new Array[Long](k)
  var size = 0

  def insert(v: Long): Unit = {
    // binary search for v in vals[0, size)
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vals(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < size && vals(lo) == v) return // already present
    if (size < k) {
      System.arraycopy(vals, lo, vals, lo + 1, size - lo)
      vals(lo) = v; size += 1
    } else if (lo < k) { // v < current max: displace it
      System.arraycopy(vals, lo, vals, lo + 1, k - lo - 1)
      vals(lo) = v
    }
  }
}

/** `kmv_sketch(h, k)`: aggregate to the ascending array of the ≤ k
  * smallest distinct BIGINT hashes of the group. With hashes uniform on
  * [0, 2⁶⁰) (the engine's md5-60 convention), the caller estimates the
  * group's distinct count as (k−1)·2⁶⁰ / kth-min when the sketch is full
  * — and reads the EXACT distinct count as the array size when it isn't.
  * Deterministic (no sampling, no seed): same data → same sketch on any
  * partitioning, so the estimate is engine-portable and retry-stable. */
case class KmvSketch(
    h: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k > 1, s"kmv_sketch requires k > 1, got $k")

  override def children: Seq[Expression] = Seq(h)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (h.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"kmv_sketch: hash must be BIGINT, got ${h.dataType}")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = h.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.vals(i)); i += 1 }
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) { out(i) = buf.vals(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    // the serialized form is already sorted-distinct; inserts stay O(k)
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(h = newChildren(0))

  override def prettyName: String = "kmv_sketch"
}
