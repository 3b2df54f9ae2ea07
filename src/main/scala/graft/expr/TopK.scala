package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most k (score, id) pairs, ordered so the
  * WEAKEST element (lowest score; ties: highest id) is always at the heap
  * root and gets replaced first. Linear storage + sift — k is small
  * (top-k queries run with k in the tens). */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a = (s1,i1) weaker than b = (s2,i2)? (score asc, id desc) */
  @inline private def weaker(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      // sift up (min-heap on "weakness": weakest at root)
      while (i > 0 && weaker(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (weaker(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  /** indices sorted strongest-first (score desc, id asc). */
  def sortedIndices: Array[Int] =
    (0 until size).toArray.sortWith { (a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
    }
}

/** Top-k by score as a partial-aggregating expression: each partition
  * keeps a bounded heap per group, so the shuffle carries at most
  * `groups × k` rows instead of every scored pair — the scale fix for
  * "window over all scored pairs" top-k (a corpus-sized exchange onto
  * #queries partitions). Output: array<struct<n_id, sim, rk>> sorted
  * strongest-first with rk = 1..k (ties: higher score first, then lower
  * id — the same ordering as `row_number over (order by sim desc, id)`).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk_by requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false),
    StructField("rk", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val order = buf.sortedIndices
    val rows = new Array[Any](order.length)
    var r = 0
    while (r < order.length) {
      rows(r) = InternalRow(buf.ids(order(r)), buf.scores(order(r)), (r + 1).toLong)
      r += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_by"
}
