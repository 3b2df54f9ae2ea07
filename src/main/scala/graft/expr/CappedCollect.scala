package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded (id, n) collection: keeps the TRUE group count but stores at
  * most `limit` members — the memory-safe building block for
  * "group by key, then work on the member list only when the group is
  * small" plans (df-capped shingle pair generation). A boilerplate
  * shingle appearing in 10⁹ documents costs 10⁹ in `count` but only
  * `limit` slots of buffer, so the aggregation can never OOM on a hot
  * key the downstream filter was going to discard anyway. */
final class CappedListBuffer(val limit: Int) {
  var count: Long = 0L
  val ids = new Array[Long](limit)
  val ns = new Array[Long](limit)
  var stored: Int = 0

  def insert(id: Long, n: Long): Unit = {
    count += 1
    if (stored < limit) { ids(stored) = id; ns(stored) = n; stored += 1 }
  }
}

/** Aggregate `collect_capped(id, n, limit)` →
  * `struct<df: bigint, docs: array<struct<id: bigint, n: bigint>>>`.
  *
  * `df` is the exact group size; `docs` holds up to `limit` members,
  * sorted by id ascending (deterministic, and lets pair generation emit
  * `a_id < b_id` ordered pairs without a comparison filter). When
  * `df > limit` the stored members are an arbitrary prefix — callers
  * must filter `df <= cap` (with `limit = cap + 1`) before using `docs`,
  * which is exactly the df-cap contract. Partial-aggregates map-side:
  * the shuffle carries ≤ limit entries per (partition, key). */
case class CollectCapped(
    id: Expression,
    n: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedListBuffer] {

  require(limit > 0, s"collect_capped requires limit > 0, got $limit")

  override def children: Seq[Expression] = Seq(id, n)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("docs", ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): CappedListBuffer = new CappedListBuffer(limit)

  override def update(buf: CappedListBuffer, input: InternalRow): CappedListBuffer = {
    val i = id.eval(input)
    val c = n.eval(input)
    if (i != null && c != null)
      buf.insert(i.asInstanceOf[Long], c.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CappedListBuffer, other: CappedListBuffer): CappedListBuffer = {
    // true count always accumulates; storage saturates at limit
    buf.count += other.count - other.stored
    var i = 0
    while (i < other.stored) { buf.insert(other.ids(i), other.ns(i)); i += 1 }
    buf
  }

  override def eval(buf: CappedListBuffer): Any = {
    val order = (0 until buf.stored).toArray.sortBy(buf.ids(_))
    val rows = new Array[Any](order.length)
    var r = 0
    while (r < order.length) {
      rows(r) = InternalRow(buf.ids(order(r)), buf.ns(order(r)))
      r += 1
    }
    InternalRow(buf.count, new GenericArrayData(rows))
  }

  override def serialize(buf: CappedListBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 16 * buf.stored)
    bb.putLong(buf.count)
    bb.putInt(buf.stored)
    var i = 0
    while (i < buf.stored) { bb.putLong(buf.ids(i)); bb.putLong(buf.ns(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedListBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CappedListBuffer(limit)
    buf.count = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n && i < limit) { buf.ids(i) = bb.getLong; buf.ns(i) = bb.getLong; i += 1 }
    buf.stored = math.min(n, limit)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CollectCapped =
    copy(id = newChildren(0), n = newChildren(1))

  override def prettyName: String = "collect_capped"
}
