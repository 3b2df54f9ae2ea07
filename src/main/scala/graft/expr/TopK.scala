package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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

/** Bounded top-k buffer keyed by (long score, string key): at most k
  * entries ordered so the WEAKEST (lowest score; ties: lexicographically
  * GREATEST key) sits at the heap root — strongest-first drain order is
  * `score desc, key asc`, i.e. exactly `row_number over (order by score
  * desc, key)`. Each slot also carries `nPayload` opaque longs that ride
  * along untouched (tf/df-style companion values). Keys are cloned on
  * insert (Catalyst reuses row buffers). */
final class TopKStrBuffer(val k: Int, val nPayload: Int) {
  val scores = new Array[Long](k)
  val keys = new Array[UTF8String](k)
  val payloads = new Array[Array[Long]](k)
  var size = 0

  /** (s1,k1) weaker than (s2,k2)? (score asc, key desc) */
  @inline private def weaker(s1: Long, k1: UTF8String, s2: Long, k2: UTF8String): Boolean =
    s1 < s2 || (s1 == s2 && k1.compareTo(k2) > 0)

  def insert(s: Long, key: UTF8String, payload: Array[Long]): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; keys(i) = key; payloads(i) = payload; size += 1
      while (i > 0 && weaker(scores(i), keys(i), scores((i - 1) / 2), keys((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (weaker(scores(0), keys(0), s, key)) {
      scores(0) = s; keys(0) = key; payloads(0) = payload
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && weaker(scores(l), keys(l), scores(m), keys(m))) m = l
        if (r < size && weaker(scores(r), keys(r), scores(m), keys(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val tk = keys(i); keys(i) = keys(j); keys(j) = tk
    val tp = payloads(i); payloads(i) = payloads(j); payloads(j) = tp
  }

  /** indices sorted strongest-first (score desc, key asc). */
  def sortedIndices: Array[Int] =
    (0 until size).toArray.sortWith { (a, b) =>
      scores(a) > scores(b) ||
        (scores(a) == scores(b) && keys(a).compareTo(keys(b)) < 0)
    }
}

/** String-keyed top-k partial aggregate: the [[TopKByScore]] shape for
  * groups ranked on `(long score desc, string key asc)` where the key and
  * a few companion long columns must surface in the output — so no
  * hash-id indirection and no join-back to recover the string. The
  * shuffle after the partial carries ≤ groups×k entries; the per-group
  * sort a `row_number` window would do never happens.
  *
  * Output: array<struct<id string, vals array<long>, rk long>> sorted
  * strongest-first, rk = 1..k; `vals` is the payload columns in call
  * order. Rows with a null score, key, or payload value are ignored
  * (the TF-IDF inputs are all non-null aggregates; nulls would have no
  * portable rank anyway). */
case class TopKByScoreStr(
    score: Expression,
    key: Expression,
    payload: Seq[Expression],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] {

  require(k > 0, s"topk_by_str requires k > 0, got $k")

  override def children: Seq[Expression] = score +: key +: payload
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("vals", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("rk", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"topk_by_str: score must be BIGINT, got ${score.dataType}")
    else if (key.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"topk_by_str: key must be STRING, got ${key.dataType}")
    else payload.find(_.dataType != LongType) match {
      case Some(p) =>
        TypeCheckResult.TypeCheckFailure(s"topk_by_str: payload must be BIGINT, got ${p.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k, payload.length)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val kv = key.eval(input)
    if (s != null && kv != null) {
      val vals = new Array[Long](payload.length)
      var i = 0
      var ok = true
      while (ok && i < payload.length) {
        val p = payload(i).eval(input)
        if (p == null) ok = false else { vals(i) = p.asInstanceOf[Long]; i += 1 }
      }
      if (ok) // clone: the UTF8String points into a reused row buffer
        buf.insert(s.asInstanceOf[Long], kv.asInstanceOf[UTF8String].clone(), vals)
    }
    buf
  }

  override def merge(buf: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.keys(i), other.payloads(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKStrBuffer): Any = {
    val order = buf.sortedIndices
    val rows = new Array[Any](order.length)
    var r = 0
    while (r < order.length) {
      val i = order(r)
      rows(r) = InternalRow(buf.keys(i),
        ArrayData.toArrayData(buf.payloads(i)), (r + 1).toLong)
      r += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    var bytes = 8
    var i = 0
    while (i < buf.size) { bytes += 8 + 4 + buf.keys(i).numBytes() + 8 * buf.nPayload; i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size); bb.putInt(buf.nPayload)
    i = 0
    while (i < buf.size) {
      bb.putLong(buf.scores(i))
      val kb = buf.keys(i).getBytes
      bb.putInt(kb.length); bb.put(kb)
      var p = 0
      while (p < buf.nPayload) { bb.putLong(buf.payloads(i)(p)); p += 1 }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val np = bb.getInt
    val buf = new TopKStrBuffer(k, np)
    var i = 0
    while (i < n) {
      val s = bb.getLong
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      val vals = new Array[Long](np)
      var p = 0
      while (p < np) { vals(p) = bb.getLong; p += 1 }
      buf.insert(s, UTF8String.fromBytes(kb), vals)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScoreStr =
    copy(score = newChildren(0), key = newChildren(1), payload = newChildren.drop(2))

  override def prettyName: String = "topk_by_str"
}
