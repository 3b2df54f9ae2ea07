package graft.registry

import graft.SparkSpec
import graft.model.{Cell, MutationEvent}
import org.apache.spark.sql.functions._

/** The production Supervisor shape, actually run: N real streaming
  * indexers draining CONCURRENTLY in one JVM (the reference supervises
  * many indexers at once, each with its own worker threads —
  * IndexerSupervisor.java:233-237), plus mixed stream families sharing
  * the JVM the way a real deployment's drains share a cluster.
  * [[graft.streaming.TriggerScope]] made this safe by construction (each
  * query owns its cloned session); this suite is the soak that proves it
  * end-to-end: per-drain state must be IDENTICAL to the serial run of
  * the same definitions, and the walls of both shapes are printed for
  * the bench notes. */
class ConcurrentDrainSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val confXml =
    """<indexer table="events" read-row="never">
      |  <field name="val_s" value="evt:*" type="string"/>
      |  <field name="etype_s" value="evt:*" source="qualifier" type="string"/>
      |</indexer>""".stripMargin

  private def writeLog(logDir: String, events: Seq[MutationEvent]): Unit = {
    import spark.implicits._
    spark.createDataset(events).toDF()
      .coalesce(1).write.mode("append").parquet(logDir)
  }

  private def ev(user: String, seq: Long, writeTime: Long, etype: String, v: String) =
    MutationEvent("events", user, seq, writeTime,
      Seq(Cell("evt", etype, seq, "put", v)), None)

  /** Distinct per-indexer event streams: indexer i's log carries users
    * u{i}_1..u{i}_n with i-salted values, written as `batches` separate
    * files so maxFilesPerTrigger=1 yields that many real triggers. */
  private def buildLogs(logsRoot: String, names: Seq[String], batches: Int): Unit =
    names.zipWithIndex.foreach { case (name, i) =>
      (1 to batches).foreach { b =>
        writeLog(s"$logsRoot/$name",
          (1 to 4).map(j => ev(s"u${i}_${(b - 1) * 4 + j}", (b * 10 + j).toLong,
            10L, s"e$b", s"v$i.$b.$j")))
        // a same-row update in a LATER batch: last-wins must hold per drain
        if (b == batches)
          writeLog(s"$logsRoot/$name",
            Seq(ev(s"u${i}_1", (b * 10 + 9).toLong, 10L, "upd", s"v$i.final")))
      }
    }

  private def stateMap(sup: IndexerSupervisor, name: String): Map[String, String] =
    sup.indexState(name).get
      .select(col("id"), element_at(col("doc")("val_s"), 1).as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("≥3 supervisor indexers drain concurrently; per-drain state ≡ serial sync") {
    val names = Seq("idx_a", "idx_b", "idx_c", "idx_d")
    val logs = tmp("graft_cdrain_logs")
    buildLogs(logs, names, batches = 3)

    def mkSup(work: String, regDir: String): IndexerSupervisor = {
      val reg = new IndexerRegistry(regDir)
      names.foreach(n => reg.add(IndexerDefinition(n, confXml)))
      new IndexerSupervisor(spark, reg, work, n => s"$logs/$n")
    }

    val serialSup = mkSup(tmp("graft_cdrain_ws"), tmp("graft_cdrain_regs"))
    val t0 = System.nanoTime()
    serialSup.sync()
    val serialSec = (System.nanoTime() - t0) / 1e9

    val concSup = mkSup(tmp("graft_cdrain_wc"), tmp("graft_cdrain_regc"))
    val t1 = System.nanoTime()
    concSup.syncConcurrent(maxConcurrent = names.size)
    val concSec = (System.nanoTime() - t1) / 1e9

    info(f"serial sync: $serialSec%.2f s; concurrent sync (${names.size} drains): $concSec%.2f s")
    println(f"[concurrent-drain] serial=$serialSec%.2f s concurrent=$concSec%.2f s drains=${names.size}")

    names.foreach { n =>
      val serial = stateMap(serialSup, n)
      val conc = stateMap(concSup, n)
      assert(conc == serial, s"drain $n diverged under concurrency")
      assert(serial.nonEmpty, s"drain $n indexed nothing — fixture broken")
      // the last-wins update must have landed in both shapes
      val i = names.indexOf(n)
      assert(conc(s"u${i}_1") == s"v$i.final", s"$n lost last-wins under concurrency")
      // progress accounted per drain (listener keys by runId, so the
      // concurrent totals must not bleed across drains)
      val rep = concSup.progressReport(n).get
      assert(rep.batches >= 3, s"$n: expected ≥3 triggers, got ${rep.batches}")
    }
    assert(concSup.runningIndexers.isEmpty, "all drains must have completed")
  }

  test("mixed stream families run concurrently in one JVM ≡ their serial results") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    // three DIFFERENT stateful families: the supervisor indexer path
    // (s01's machinery), the span-dedup keep-first stream (s12), and the
    // transitions census (s20) — each with its own state store and
    // checkpoint, sharing one JVM and one SparkContext
    val mixed = Seq("s12_stream_span_dedup", "s20_stream_transitions")
    def runQuery(name: String): Seq[String] =
      graft.SparkEntry.queries(name)(spark, sf0001)
        .collect().map(_.toString).sorted.toSeq

    val serial = mixed.map(n => n -> runQuery(n)).toMap

    // fresh supervisor drain to interleave with the two query families
    val logs = tmp("graft_cmix_logs")
    buildLogs(logs, Seq("idx_m"), batches = 3)
    val reg = new IndexerRegistry(tmp("graft_cmix_reg"))
    reg.add(IndexerDefinition("idx_m", confXml))
    val sup = new IndexerSupervisor(spark, reg, tmp("graft_cmix_work"), n => s"$logs/$n")

    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(
        java.util.concurrent.Executors.newFixedThreadPool(mixed.size + 1))
    val fs = mixed.map(n => Future(n -> runQuery(n))) :+ Future {
      sup.sync(); "sup" -> Seq.empty[String]
    }
    val concurrent = Await.result(Future.sequence(fs), 600.seconds).toMap

    mixed.foreach { n =>
      assert(concurrent(n) == serial(n), s"$n diverged when run concurrently")
      assert(serial(n).nonEmpty, s"$n returned no rows — fixture broken")
    }
    assert(stateMap(sup, "idx_m").nonEmpty, "supervisor drain must have indexed")
  }
}
