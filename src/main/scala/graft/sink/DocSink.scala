package graft.sink

import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicLong

/** The document-sink calculus of the reference, sink-agnostic:
  *
  *  - S6 error split (DirectSolrInputDocumentWriter.java:57-108): a
  *    *document* problem (the reference's Solr HTTP 400) drops that one
  *    document — retried individually so one poisoned doc can't sink its
  *    batch — while any other error propagates, failing the batch for
  *    redelivery (at-least-once, T1);
  *  - S8 buffering (BufferedSolrInputDocumentWriter.java:48-110): adds
  *    and deletes buffer to `bufferSize` (reference default 100,
  *    HBaseIndexerMapper.java:293) and flush on overflow/close;
  *  - A5 sharding (HashSharder.java:38-48): shard = first 2 bytes of
  *    MD5(id) mod numShards — bit-identical to the engine's SQL
  *    `md5_shard` expression;
  *  - A7 metrics (IndexingEventListener.java:62-67): adds / deletes /
  *    dropped-error counts per writer.
  */
object Sharding {
  /** JVM-side mirror of the `md5_shard` expression. */
  def md5Shard(id: String, numShards: Int): Int = {
    val d = MessageDigest.getInstance("MD5").digest(id.getBytes("UTF-8"))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % numShards
  }
}

/** One document: id → (field → values). */
case class Doc(id: String, fields: Map[String, Seq[String]])

/** The "HTTP 400" class: the document itself is unprocessable. */
class DocumentWriteException(msg: String) extends RuntimeException(msg)

final class SinkMetrics {
  val adds = new AtomicLong()
  val deletes = new AtomicLong()
  val documentErrors = new AtomicLong()
  override def toString: String =
    s"adds=${adds.get} deletes=${deletes.get} documentErrors=${documentErrors.get}"
}

/** Sink-agnostic writer seam (S6/S7: direct or sharded-classic are both
  * just implementations of this). */
trait DocWriter {
  def add(shard: Int, docs: Seq[Doc]): Unit
  def deleteById(shard: Int, ids: Seq[String]): Unit
  def close(): Unit = ()
}

/** S6: the 400-vs-retry split. Bulk add first; if the delegate signals a
  * document problem, retry one-by-one, dropping (and counting) only the
  * offending docs. Everything else propagates — the caller's batch fails
  * and redelivers. */
class ErrorIsolatingWriter(delegate: DocWriter, metrics: SinkMetrics) extends DocWriter {
  override def add(shard: Int, docs: Seq[Doc]): Unit =
    try {
      delegate.add(shard, docs)
      metrics.adds.addAndGet(docs.size)
    } catch {
      case _: DocumentWriteException =>
        docs.foreach { doc =>
          try {
            delegate.add(shard, Seq(doc))
            metrics.adds.incrementAndGet()
          } catch {
            case _: DocumentWriteException => metrics.documentErrors.incrementAndGet()
          }
        }
    }

  override def deleteById(shard: Int, ids: Seq[String]): Unit = {
    delegate.deleteById(shard, ids)
    metrics.deletes.addAndGet(ids.size)
  }

  override def close(): Unit = delegate.close()
}

/** S8: per-shard buffering decorator; flushes at `bufferSize` and on
  * close. Buffering either kind flushes the shard's OTHER buffer first,
  * so per-shard add/delete ordering is always preserved (at most one
  * buffer is ever non-empty per shard): delete(X) then add(X) must leave
  * X present, and add(X) then delete(X) must leave it absent. */
class BufferedDocWriter(delegate: DocWriter, bufferSize: Int = 100) extends DocWriter {
  private val addBuf = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Doc]]
  private val delBuf = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[String]]

  override def add(shard: Int, docs: Seq[Doc]): Unit = {
    flushDeletes(shard)
    val b = addBuf.getOrElseUpdate(shard, scala.collection.mutable.ArrayBuffer.empty)
    b ++= docs
    if (b.size >= bufferSize) flushShard(shard)
  }

  override def deleteById(shard: Int, ids: Seq[String]): Unit = {
    flushAdds(shard)
    val b = delBuf.getOrElseUpdate(shard, scala.collection.mutable.ArrayBuffer.empty)
    b ++= ids
    if (b.size >= bufferSize) flushShard(shard)
  }

  private def flushAdds(shard: Int): Unit =
    addBuf.remove(shard).filter(_.nonEmpty).foreach(b => delegate.add(shard, b.toSeq))

  private def flushDeletes(shard: Int): Unit =
    delBuf.remove(shard).filter(_.nonEmpty).foreach(b => delegate.deleteById(shard, b.toSeq))

  private def flushShard(shard: Int): Unit = {
    flushAdds(shard)
    flushDeletes(shard)
  }

  def flush(): Unit = (addBuf.keySet ++ delBuf.keySet).toSeq.foreach(flushShard)

  override def close(): Unit = {
    flush()
    delegate.close()
  }
}

/** A trivially inspectable in-memory sink (the tests' Solr stand-in). A
  * document whose id is in `poison` throws the 400-class error. */
class InMemoryDocStore(poison: Set[String] = Set.empty) extends DocWriter {
  val store = new java.util.concurrent.ConcurrentHashMap[(Int, String), Doc]()

  override def add(shard: Int, docs: Seq[Doc]): Unit = {
    docs.find(d => poison.contains(d.id)).foreach { bad =>
      throw new DocumentWriteException(s"unprocessable document: ${bad.id}")
    }
    docs.foreach(d => store.put((shard, d.id), d))
  }

  override def deleteById(shard: Int, ids: Seq[String]): Unit =
    ids.foreach(id => store.remove((shard, id)))
}
