package graft.expr

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** SolrCloud-compatible document routing for offline shard builds.
  *
  * The reference wires Solr's `SolrCloudPartitioner` into the offline
  * build so batch-built shards receive exactly the documents the live
  * SolrCloud NRT API would route to them — mixing batch and NRT updates
  * on identical unique keys (reference
  * hbase-indexer-mr/src/main/java/com/ngdata/hbaseindexer/mr/
  * HBaseMapReduceIndexerTool.java:397-417 and the partitioner's own
  * contract comment there). That routing is public Solr semantics:
  *
  *   - hash = MurmurHash3 x86 32-bit, seed 0, over the UTF-8 bytes of
  *     the unique key (Solr `Hash.murmurhash3_x86_32`);
  *   - compositeId: an id `prefix!suffix` takes its top 16 bits from
  *     hash(prefix) and its bottom 16 from hash(suffix), so all docs
  *     sharing a route prefix co-locate (Solr `CompositeIdRouter`,
  *     default single-level 16/16 split);
  *   - the 32-bit ring [Int.MinValue, Int.MaxValue] splits into
  *     `numShards` contiguous ranges (Solr `DocRouter.partitionRange`):
  *     every range spans `step+1 = ((2^32-1) / numShards) + 1` values
  *     except the last, which absorbs the remainder — equivalently
  *     `shard = min(numShards-1, (hash - Int.MinValue) / (step+1))`.
  *
  * The algorithm is re-implemented from the published MurmurHash3
  * specification; nothing here reads Solr or reference code.
  */
object SolrRouteHash {

  /** MurmurHash3 x86 32-bit, seed 0, over UTF-8 bytes — the Solr
    * unique-key hash. Returns the SIGNED 32-bit hash. */
  def murmur3(s: String): Int = murmur3(s.getBytes(StandardCharsets.UTF_8))

  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    val nBlocks = len >>> 2
    var h = 0
    var i = 0
    while (i < nBlocks) {
      val o = i << 2
      var k = (data(o) & 0xff) | ((data(o + 1) & 0xff) << 8) |
        ((data(o + 2) & 0xff) << 16) | ((data(o + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 1
    }
    val tail = nBlocks << 2
    var k = 0
    (len & 3) match {
      case 3 =>
        k = ((data(tail + 2) & 0xff) << 16) |
          ((data(tail + 1) & 0xff) << 8) | (data(tail) & 0xff)
      case 2 =>
        k = ((data(tail + 1) & 0xff) << 8) | (data(tail) & 0xff)
      case 1 =>
        k = data(tail) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
    }
    h ^= len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** The compositeId slice hash: `prefix!suffix` composes 16/16; a
    * plain id hashes whole. (Multi-level `a/b!` bit syntax is out of
    * scope — the reference partitioner only ever routes 2-part keys.) */
  def sliceHash(id: String): Int = {
    val bang = id.indexOf('!')
    if (bang < 0) murmur3(id)
    else (murmur3(id.substring(0, bang)) & 0xffff0000) |
      (murmur3(id.substring(bang + 1)) & 0x0000ffff)
  }

  /** Shard index for `id` under a `numShards`-way even range split. */
  def shard(id: String, numShards: Int): Int = {
    val stepPlus1 = (0xffffffffL / numShards) + 1L
    val u = sliceHash(id).toLong - Int.MinValue.toLong // 0 .. 2^32-1
    math.min(numShards - 1, (u / stepPlus1).toInt)
  }

  def shard(id: UTF8String, numShards: Int): Int = shard(id.toString, numShards)
}

/** Codegen'd `solr_shard(id, numShards)` — one virtual call per row into
  * the static router, no boxing on the hot path. */
case class SolrShard(child: Expression, numShards: Int) extends UnaryExpression {
  require(numShards > 0, s"numShards must be positive, got $numShards")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    SolrRouteHash.shard(input.asInstanceOf[UTF8String], numShards)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.SolrRouteHash.shard($c, $numShards);")

  override protected def withNewChildInternal(newChild: Expression): SolrShard =
    copy(child = newChild)
}
