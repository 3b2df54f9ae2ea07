package graft.registry

import graft.SparkSpec
import graft.model.{Cell, MutationEvent}
import org.apache.spark.sql.functions._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** C5: the full reference REST operation set
  * (IndexerResource.java:60-196) driven over actual HTTP — list, get,
  * get-config, update-with-OCC (409 on stale), one-row reindex, batch
  * rebuild — against a live registry + supervisor. */
class RestApiSpec extends SparkSpec {

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private val confXml =
    """<indexer table="events" read-row="never">
      |  <field name="val_s" value="evt:*" type="string"/>
      |</indexer>""".stripMargin

  private def ev(user: String, seq: Long, v: String) =
    MutationEvent("events", user, seq, 10L, Seq(Cell("evt", "click", seq, "put", v)), None)

  private val http = HttpClient.newHttpClient()
  private def send(req: HttpRequest.Builder): HttpResponse[String] =
    http.send(req.build(), HttpResponse.BodyHandlers.ofString())
  private def get(url: String) = send(HttpRequest.newBuilder(URI.create(url)))
  private def put(url: String, body: String) =
    send(HttpRequest.newBuilder(URI.create(url)).PUT(HttpRequest.BodyPublishers.ofString(body)))
  private def post(url: String) =
    send(HttpRequest.newBuilder(URI.create(url)).POST(HttpRequest.BodyPublishers.noBody()))

  test("REST operation parity: list / get / config / OCC update / reindex-row / rebuild") {
    val reg = new IndexerRegistry(tmp("graft_rest_reg"))
    val logs = tmp("graft_rest_logs")
    val sup = new IndexerSupervisor(spark, reg, tmp("graft_rest_work"), n => s"$logs/$n")
    val srv = new RestServer(new IndexerResource(reg, sup))
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      reg.add(IndexerDefinition("idx", confXml,
        incrementalState = IncrementalIndexingState.SubscribeDoNotConsume))
      import spark.implicits._
      spark.createDataset(Seq(ev("u1", 1, "1.0"), ev("u2", 2, "2.0"))).toDF()
        .coalesce(1).write.mode("append").parquet(s"$logs/idx")

      // list + get + config
      assert(get(s"$base/indexer").body().contains("\"idx\""))
      val one = get(s"$base/indexer/idx")
      assert(one.statusCode() == 200 && one.body().contains("SUBSCRIBE_DO_NOT_CONSUME"))
      assert(get(s"$base/indexer/nope").statusCode() == 404)
      val cfg = get(s"$base/indexer/idx/config")
      assert(cfg.statusCode() == 200 && cfg.body() == confXml)

      // update with OCC: good version passes, stale version → 409
      val d0 = reg.get("idx").get
      val upd = put(s"$base/indexer/idx",
        reg.toJson(d0.copy(subscriptionTimestamp = 7L)))
      assert(upd.statusCode() == 200 && reg.get("idx").get.subscriptionTimestamp == 7L)
      val stale = put(s"$base/indexer/idx", reg.toJson(d0.copy(subscriptionTimestamp = 9L)))
      assert(stale.statusCode() == 409, stale.body())
      assert(reg.get("idx").get.subscriptionTimestamp == 7L)
      assert(put(s"$base/indexer/other", reg.toJson(d0)).statusCode() == 400)

      // one-row reindex: only u1 lands in the state
      val rx = post(s"$base/indexer/idx?action=index&id=u1")
      assert(rx.statusCode() == 200 && rx.body().contains("\"ops\": 1"), rx.body())
      val ids = sup.indexState("idx").get.select("id").collect().map(_.getString(0)).toSet
      assert(ids == Set("u1"))
      assert(post(s"$base/indexer/idx?action=index").statusCode() == 400)
      assert(post(s"$base/indexer/nope?action=index&id=x").statusCode() == 404)

      // batch rebuild of named indexers
      val rb = post(s"$base/indexer?action=index&indexes=idx")
      assert(rb.statusCode() == 200 && rb.body().contains("idx"), rb.body())
      assert(reg.get("idx").get.batchState == BatchIndexingState.Inactive)
      assert(post(s"$base/indexer?action=index&indexes=nope").statusCode() == 404)

      // T6 progress report over the wire (404 until a drain has run)
      assert(get(s"$base/indexer/idx/progress").statusCode() == 404)
      val d1 = reg.get("idx").get
      reg.update(d1.copy(incrementalState = IncrementalIndexingState.SubscribeAndConsume))
      sup.waitUntilDrained("idx")
      val prog = get(s"$base/indexer/idx/progress")
      assert(prog.statusCode() == 200, prog.body())
      assert(prog.body().contains("\"backlogFiles\": 0") &&
        prog.body().contains("MANIFEST-"), prog.body())

      // live lag census: reads log + checkpoint NOW (no drain needed)
      val lag = get(s"$base/indexer/idx/lag")
      assert(lag.statusCode() == 200, lag.body())
      assert(lag.body().contains("\"(root)\"") && lag.body().contains("\"backlog\": 0"),
        lag.body())
      assert(get(s"$base/indexer/nope/lag").statusCode() == 404)

      // delete over REST — the reference's verb is a PUT flipping
      // lifecycleState to DELETE_REQUESTED (IndexerResource.java:116-130,
      // delete executed by the watching master); here the supervisor
      // reacts in-request: definition gone, state/checkpoint dropped
      val d2 = reg.get("idx").get
      val del = put(s"$base/indexer/idx",
        reg.toJson(d2.copy(lifecycleState = LifecycleState.DeleteRequested)))
      assert(del.statusCode() == 200, del.body())
      assert(reg.get("idx").isEmpty, "definition must be removed")
      assert(get(s"$base/indexer/idx").statusCode() == 404)
      assert(!get(s"$base/indexer").body().contains("\"idx\""))
      assert(sup.indexState("idx").isEmpty, "index state must be dropped")
    } finally srv.stop()
  }

  test("arm operations over REST: re-crawl triage summary, vector compaction") {
    import spark.implicits._
    val reg = new IndexerRegistry(tmp("graft_rest_reg2"))
    val logs = tmp("graft_rest_logs2")
    val sup = new IndexerSupervisor(spark, reg, tmp("graft_rest_work2"), n => s"$logs/$n")
    val srv = new RestServer(new IndexerResource(reg, sup))
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      reg.add(IndexerDefinition("idx", confXml))

      // re-crawl summary: 404 before any baseline, counts after a diff
      assert(get(s"$base/indexer/idx/recrawl").statusCode() == 404)
      val v1 = Seq(1L -> "alpha beta gamma delta", 2L -> "one two three four",
        3L -> "gone after this crawl").toDF("doc_id", "text")
      val v2 = Seq(1L -> " alpha beta gamma delta ", 2L -> "one two three four five",
        9L -> "brand new page").toDF("doc_id", "text")
      sup.freezeRecrawlBaseline("idx", v1, "doc_id", "text")
      sup.ingestRecrawl("idx", v2, "doc_id", "text")
      val rc = get(s"$base/indexer/idx/recrawl")
      assert(rc.statusCode() == 200, rc.body())
      assert(rc.body().contains("\"added\": 1") && rc.body().contains("\"deleted\": 1") &&
        rc.body().contains("\"unchanged\": 1"), rc.body())

      // vector compaction: 404 without an index, a generation once built
      assert(post(s"$base/indexer/idx?action=compact-vectors").statusCode() == 404)
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      sup.buildVectorIndex("idx", emb, "vec_id", "embedding")
      val cp = post(s"$base/indexer/idx?action=compact-vectors")
      assert(cp.statusCode() == 200 && cp.body().contains("\"generation\""), cp.body())
      assert(post(s"$base/indexer/nope?action=compact-vectors").statusCode() == 404)

      // cell-census dashboard: every codebook cell reports (zeros too),
      // counts sum to the corpus, hot = above ⌈total/cells⌉
      val cc = get(s"$base/indexer/idx/cells")
      assert(cc.statusCode() == 200 && cc.body().contains("\"cells\""), cc.body())
      val cellsN = "\"n\": (\\d+)".r.findAllMatchIn(cc.body()).map(_.group(1).toLong).toSeq
      assert(cellsN.sum == emb.count(), s"census must cover the corpus: ${cc.body()}")
      assert(cc.body().contains("\"n_hot\""), cc.body())
      assert(get(s"$base/indexer/nope/cells").statusCode() == 404)

      // quota dashboard: empty before any admission, counters after
      val q0 = get(s"$base/indexer/idx/quota")
      assert(q0.statusCode() == 200 && q0.body().trim == "{}", q0.body())
      val chunk = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "en")).toDF("doc_id", "cls")
      sup.quotaAdmit("idx", chunk, Map("en" -> 2L, "de" -> 5L), 0L)
      val q1 = get(s"$base/indexer/idx/quota")
      assert(q1.statusCode() == 200 &&
        q1.body().contains("\"en\": 2") && q1.body().contains("\"de\": 1"), q1.body())
      assert(get(s"$base/indexer/nope/quota").statusCode() == 404)

      // a class label carrying quote/backslash/newline must come back as
      // VALID JSON (escaped), not a broken body
      val evil = "he said \"hi\"\\\n"
      sup.quotaAdmit("idx", Seq((5L, evil)).toDF("doc_id", "cls"),
        Map("en" -> 2L, "de" -> 5L, evil -> 1L), 1L)
      val q2 = get(s"$base/indexer/idx/quota")
      assert(q2.statusCode() == 200 &&
        q2.body().contains("\"he said \\\"hi\\\"\\\\\\n\": 1"), q2.body())

      // contamination-audit dashboard: 404 before freeze; after two
      // ingested chunks the verbatim probe reads contaminated, the
      // nonsense probe doesn't; re-ingesting a chunk changes nothing
      // (set-union fold)
      assert(get(s"$base/indexer/idx/coverage").statusCode() == 404)
      val bench = Seq(
        100L -> "alpha beta gamma delta epsilon zeta eta",
        101L -> "zebra xylophone quartz jackdaw vex nymph waltz")
        .toDF("doc_id", "text")
      sup.coverageFreeze("idx", bench)
      val c0 = get(s"$base/indexer/idx/coverage")
      assert(c0.statusCode() == 200 &&
        c0.body().contains("\"contaminated\": 0"), c0.body())
      sup.coverageIngest("idx",
        Seq(1L -> "alpha beta gamma delta epsilon zeta eta").toDF("doc_id", "text"), 0L)
      sup.coverageIngest("idx",
        Seq(2L -> "totally unrelated corpus text here now").toDF("doc_id", "text"), 1L)
      sup.coverageIngest("idx",
        Seq(1L -> "alpha beta gamma delta epsilon zeta eta").toDF("doc_id", "text"), 2L)
      val c1 = get(s"$base/indexer/idx/coverage")
      assert(c1.statusCode() == 200 && c1.body().contains("\"probes\": 2") &&
        c1.body().contains("\"contaminated\": 1") &&
        c1.body().contains("\"max_cov_q\": 1000000"), c1.body())
      assert(get(s"$base/indexer/nope/coverage").statusCode() == 404)
    } finally srv.stop()
  }
}
