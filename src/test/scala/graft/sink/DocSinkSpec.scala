package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S6 error calculus, S8 buffering, A5 sharding, A7 metrics — mirroring
  * the reference's DirectSolrInputDocumentWriter 400-vs-retry split and
  * BufferedSolrInputDocumentWriter tests. */
class DocSinkSpec extends SparkSpec {

  private def doc(id: String) = Doc(id, Map("f" -> Seq(id)))

  test("S6: a poisoned document is dropped individually; the rest land") {
    val store = new InMemoryDocStore(poison = Set("bad"))
    val metrics = new SinkMetrics
    val w = new ErrorIsolatingWriter(store, metrics)
    w.add(0, Seq(doc("a"), doc("bad"), doc("b"), doc("c")))
    assert(store.store.keySet().size() == 3)
    assert(metrics.adds.get == 3)
    assert(metrics.documentErrors.get == 1)
  }

  test("S6: non-document errors propagate (batch retries)") {
    val metrics = new SinkMetrics
    val failing = new DocWriter {
      override def add(shard: Int, docs: Seq[Doc]): Unit =
        throw new RuntimeException("connection refused") // a 5xx-class error
      override def deleteById(shard: Int, ids: Seq[String]): Unit = ()
    }
    val w = new ErrorIsolatingWriter(failing, metrics)
    intercept[RuntimeException] { w.add(0, Seq(doc("a")) ) }
    assert(metrics.adds.get == 0)
  }

  test("S8: buffering flushes at bufferSize and on close; order preserved") {
    val store = new InMemoryDocStore()
    val w = new BufferedDocWriter(new ErrorIsolatingWriter(store, new SinkMetrics), bufferSize = 2)
    w.add(0, Seq(doc("a")))
    assert(store.store.isEmpty, "below buffer size: not flushed yet")
    w.add(0, Seq(doc("b")))
    assert(store.store.size() == 2, "buffer overflow flushes")
    w.add(0, Seq(doc("c")))
    w.deleteById(0, Seq("c")) // delete must see the buffered add first
    w.close()
    assert(store.store.size() == 2)
    assert(!store.store.containsKey((0, "c")))
  }

  test("S8: delete-then-add of the same id leaves the doc present") {
    val store = new InMemoryDocStore()
    val w = new BufferedDocWriter(new ErrorIsolatingWriter(store, new SinkMetrics), bufferSize = 10)
    w.add(0, Seq(doc("x")))
    w.deleteById(0, Seq("x"))
    w.add(0, Seq(doc("x"))) // must flush the pending delete BEFORE buffering
    w.close()
    assert(store.store.containsKey((0, "x")), "delete→add inverted at flush")
  }

  test("A5: JVM md5Shard is bit-identical to the md5_shard SQL expression") {
    import spark.implicits._
    val ids = (1 to 200).map(_.toString)
    val viaSql = ids.toDF("id")
      .select(col("id"), graft.expr.hfunctions.md5_shard(col("id"), 8).as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    ids.foreach { id =>
      assert(Sharding.md5Shard(id, 8) == viaSql(id), s"id $id")
    }
  }
}
