package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Pins the fused-manifest crash contract (round-14's GenManifest /
  * GenMeta rework): (a) a crash between the idempotent output write and
  * the manifest commit replays into an identical overwrite, never
  * duplicates; (b) a crash after the commit is a bit-exact redelivery
  * detected by the fused (gen, lo, hi) and skipped; (c) the pre-fuse
  * filesystem layouts (gen-only `_current` + sibling `_hwm`, and the
  * bare-`_hwm` Vocab shape) stay readable across the upgrade — for the
  * dual-state monitors too, which must neither lose the redelivery
  * guard nor reset their rollup while per-key store state is retained;
  * (d) an empty delta carrying meta kv still claims a txn slot (the
  * rollup pointers must advance on an all-stale batch); (e) generation
  * sweep is two-phase with a grace window so a concurrent reader that
  * resolved the old pointer never loses its files mid-scan. */
class GenManifestSpec extends SparkSpec {

  private def copyDir(src: Path, dst: Path): Unit = {
    val walk = Files.walk(src)
    try walk.iterator().forEachRemaining { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t); () }
    } finally walk.close()
  }

  test("read: fused and pre-fuse manifest layouts") {
    val d = Files.createTempDirectory("graft_gm").toString
    assert(GenManifest.read(d).isEmpty)
    // fused: one file, one commit point
    GenManifest.commit(d, "g4", 10L, 20L)
    assert(GenManifest.read(d).contains(("g4", 10L, 20L)))
    // pre-fuse: gen-only pointer + sibling _hwm
    Files.writeString(Paths.get(d, "_current"), "g2")
    Files.writeString(Paths.get(d, "_hwm"), "3\t7")
    assert(GenManifest.read(d).contains(("g2", 3L, 7L)))
    assert(GenManifest.isRedelivery(d, 3L, 7L, "c"))
    intercept[IllegalStateException](GenManifest.isRedelivery(d, 5L, 9L, "c"))
    assert(!GenManifest.isRedelivery(d, 8L, 9L, "c"))
    // gen-only pointer with no hwm at all: pointer survives, guard open
    Files.deleteIfExists(Paths.get(d, "_hwm"))
    assert(GenManifest.currentGen(d).contains("g2"))
    assert(!GenManifest.isRedelivery(d, 1L, 2L, "c"))
    // a fused commit drops a leftover pre-fuse _hwm sibling
    Files.writeString(Paths.get(d, "_hwm"), "1\t1")
    GenManifest.commit(d, "g5", 8L, 9L)
    assert(!Files.exists(Paths.get(d, "_hwm")))
  }

  test("GenMeta: legacy filesystem layouts are honored until the store meta takes over") {
    val work = Files.createTempDirectory("graft_gm2").toString
    val st = new TxnLogState(s"$work/st", spark, 4)
    // pre-fuse aggDir layout: gen pointer + hwm as files
    val agg = s"$work/agg"; Files.createDirectories(Paths.get(agg))
    Files.writeString(Paths.get(agg, "_current"), "g0")
    Files.writeString(Paths.get(agg, "_hwm"), "1\t4")
    assert(GenMeta.currentGen(st, "ns", agg).contains("g0"))
    assert(GenMeta.isRedelivery(st, "ns", agg, 1L, 4L, "c"))
    intercept[IllegalStateException](GenMeta.isRedelivery(st, "ns", agg, 3L, 9L, "c"))
    assert(!GenMeta.isRedelivery(st, "ns", agg, 5L, 9L, "c"))
    // the bare-_hwm shape (pre-fuse StreamVocab): no pointer, guard intact
    val vdir = s"$work/v"; Files.createDirectories(Paths.get(vdir))
    Files.writeString(Paths.get(vdir, "_hwm"), "2\t6")
    assert(GenMeta.currentGen(st, "ns", vdir).isEmpty)
    assert(GenMeta.isRedelivery(st, "ns", vdir, 2L, 6L, "c"))
    // once the store meta exists it OWNS the answer, files ignored
    import spark.implicits._
    st.commitAppendWithMeta(Seq.empty[String].toDF("id"), "r0000000000",
      Seq.empty, GenMeta.kv("ns", "g9", 7L, 8L))
    assert(GenMeta.currentGen(st, "ns", agg).contains("g9"))
    assert(GenMeta.isRedelivery(st, "ns", agg, 7L, 8L, "c"))
  }

  test("empty delta with kv claims a txn slot; without kv it claims nothing") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_gm3").toString
    val st = new TxnLogState(s"$work/st", spark, 4)
    def slots = {
      val l = Files.list(Paths.get(s"$work/st", "_txnlog"))
      try {
        var n = 0; val it = l.iterator()
        while (it.hasNext) if (it.next().getFileName.toString.endsWith(".txn")) n += 1
        n
      } finally l.close()
    }
    st.commitAppendWithMeta(Seq.empty[String].toDF("id"), "r0000000000",
      Seq.empty, Map("m.gen" -> "g1", "m.hwm" -> "1,2"))
    assert(slots == 1, "a kv-carrying empty delta must claim a txn slot")
    // a FRESH handle over the same dir must see the meta (it rode the log)
    val st2 = new TxnLogState(s"$work/st", spark, 4)
    assert(st2.stateMeta("m.gen").contains("g1"))
    assert(st2.stateMeta("m.hwm").contains("1,2"))
    // an empty delta with NO kv is a true no-op: nothing to log
    st.commitAppend(Seq.empty[String].toDF("id"), "r0000000001", Seq.empty)
    assert(slots == 1, "an empty delta with no kv must not claim a slot")
    val st3 = new TxnLogState(s"$work/st", spark, 4)
    assert(st3.stateMeta("m.gen").contains("g1"))
  }

  test("dual-state upgrade: retained per-key state + legacy manifest continue, not reset") {
    import spark.implicits._
    val docs = Seq((1L, "srcA", "a b"), (2L, "srcA", "x y z"),
      (3L, "srcB", "c d e"), (4L, "srcB", " a  b "),
      (5L, "srcA", "x y z")).toDF("doc_id", "source", "text")
    val work = Files.createTempDirectory("graft_gm4").toString
    val agg = s"$work/agg"; Files.createDirectories(Paths.get(agg))
    val seen = new TxnLogState(s"$work/seen", spark, 4)
    // ---- hand-build the PRE-UPGRADE world after trigger 1 (docs 1-2):
    // per-key seen-set committed WITHOUT meta (the old store shape) ...
    val ids = docs.filter(col("doc_id") <= 2)
      .select(graft.ops.TextAnalysis.fingerprint(col("text")).as("id")).distinct()
    val touched = ids.select(graft.expr.hfunctions.md5_shard(col("id"), seen.buckets).as("bk"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    seen.commitAppend(ids, "r0000000000", touched)
    // ... plus the rollup generation and the legacy two-file manifest
    Seq(("srcA", 5L, 5L)).toDF("source", "raw_tokens", "unique_tokens")
      .write.parquet(s"$agg/g0")
    Files.writeString(Paths.get(agg, "_current"), "g0")
    Files.writeString(Paths.get(agg, "_hwm"), "1\t2")
    // ---- restart on the fused code path:
    // the legacy rollup is readable through the fallback pointer
    val s0 = StreamUniqueTokens.summary(spark, seen, agg).collect()
    assert(s0.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("srcA", 5L, 5L)), s0.mkString(","))
    // a redelivery of trigger 1 is caught by the LEGACY hwm, not re-folded
    StreamUniqueTokens.applyBatch(seen, agg, docs.filter(col("doc_id") <= 2), 5L)
    assert(StreamUniqueTokens.summary(spark, seen, agg).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("srcA", 5L, 5L)))
    // fresh triggers fold ON TOP of the retained state — totals equal the
    // never-upgraded run (StreamUniqueTokensSpec's contract numbers)
    StreamUniqueTokens.applyBatch(seen, agg,
      docs.filter(col("doc_id") > 2 && col("doc_id") <= 4), 6L)
    StreamUniqueTokens.applyBatch(seen, agg, docs.filter(col("doc_id") > 4), 7L)
    val got = StreamUniqueTokens.summary(spark, seen, agg)
      .orderBy(col("source")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("srcA") == ((8L, 5L, 375000L)), got.toString)
    assert(got("srcB") == ((5L, 3L, 400000L)), got.toString)
    // and the store meta has taken over + the legacy files were swept
    assert(seen.stateMeta("uniqtok.gen").contains("g7"))
    assert(!Files.exists(Paths.get(agg, "_current")))
    assert(!Files.exists(Paths.get(agg, "_hwm")))
  }

  test("quota: kill between output write and manifest commit replays without duplicates") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "a"), (5L, "b"))
      .toDF("doc_id", "cls")
    val quotas = Map("a" -> 2L, "b" -> 10L)
    val work = Files.createTempDirectory("graft_gm5").toString
    val (state, out) = (s"$work/state", s"$work/out")
    StreamQuota.applyBatch(state, quotas, docs.filter(col("doc_id") <= 2), out, 0L)
    // snapshot the pre-batch-1 durable state (manifest + counter gen)
    val cur0 = Files.readString(Paths.get(state, "_current"))
    val g0 = GenManifest.currentGen(state).get
    copyDir(Paths.get(state, g0), Paths.get(s"$work/g0_saved"))
    def admitted() = spark.read.parquet(out)
      .select(col("doc_id"), col("cls"), col("adm_rk"))
      .orderBy(col("doc_id")).collect().toSeq
    StreamQuota.applyBatch(state, quotas,
      docs.filter(col("doc_id") > 2), out, 1L)
    val once = admitted()
    // quota a=2 → doc 4 rejected; within-batch rank continues the counter
    assert(once.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      == Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "a", 2L), (5L, "b", 2L)))
    // ---- simulate the crash: output + new gen landed, commit did NOT —
    // restore the pre-batch manifest and the old counter generation
    IndexState.atomicWriteString(Paths.get(state, "_current"), cur0)
    copyDir(Paths.get(s"$work/g0_saved"), Paths.get(state, g0))
    StreamQuota.applyBatch(state, quotas,
      docs.filter(col("doc_id") > 2), out, 1L) // the replay
    assert(admitted() == once, "replay must overwrite identically, not append")
    // ---- and a post-commit redelivery is skipped outright (fused lo/hi)
    val cur1 = Files.readString(Paths.get(state, "_current"))
    StreamQuota.applyBatch(state, quotas,
      docs.filter(col("doc_id") > 2), out, 2L)
    assert(admitted() == once)
    assert(Files.readString(Paths.get(state, "_current")) == cur1,
      "a skipped redelivery must not advance the manifest")
  }

  test("sweep: two-phase with grace window; doomed dirs stay readable until it expires") {
    val agg = Files.createTempDirectory("graft_gm6").toString
    Files.createDirectories(Paths.get(agg, "g0"))
    Files.writeString(Paths.get(agg, "g0", "part-0"), "x")
    Files.createDirectories(Paths.get(agg, "g1"))
    Files.writeString(Paths.get(agg, "_current"), "g0") // superseded legacy pointer
    // first sweep: stamps, does NOT delete (grace window open)
    GenMeta.sweep(agg, keep = "g1", graceMs = 60 * 60 * 1000L)
    assert(Files.exists(Paths.get(agg, "g0", "part-0")), "grace window must hold")
    assert(Files.exists(Paths.get(agg, "g0", "_doomed")))
    assert(!Files.exists(Paths.get(agg, "_current")), "legacy pointer dropped")
    // sweep with the window expired: reclaimed
    GenMeta.sweep(agg, keep = "g1", graceMs = 0L)
    assert(!Files.exists(Paths.get(agg, "g0")))
    assert(Files.exists(Paths.get(agg, "g1")))
    // a re-committed (live-again) generation gets its stale stamp cleared
    Files.createDirectories(Paths.get(agg, "g2"))
    GenMeta.sweep(agg, keep = "g1", graceMs = 60 * 60 * 1000L) // dooms g2
    GenMeta.sweep(agg, keep = "g2", graceMs = 60 * 60 * 1000L) // g2 live again
    assert(!Files.exists(Paths.get(agg, "g2", "_doomed")))
  }

  test("sweep: count-bounded retention deletes beyond graceKeep even inside the window") {
    val agg = Files.createTempDirectory("graft_gm7").toString
    (0 to 5).foreach { i =>
      Files.createDirectories(Paths.get(agg, s"g$i"))
      Files.writeString(Paths.get(agg, s"g$i", "part-0"), "x")
    }
    // g5 live; g0..g4 superseded, all inside a wide-open grace window.
    // Commit count alone must NOT delete — a reader that just resolved
    // g0 may still be materializing its lazy scan (the floor is its
    // hard bound), so with the default floor everything lingers
    GenMeta.sweep(agg, keep = "g5", graceMs = 60 * 60 * 1000L, graceKeep = 2)
    (0 to 4).foreach(i => assert(Files.exists(Paths.get(agg, s"g$i")),
      s"g$i must survive: count rank alone never deletes inside the floor"))
    // once the floor has passed, only the graceKeep=2 newest (g4, g3)
    // keep the FULL window; older ones are reclaimed
    GenMeta.sweep(agg, keep = "g5", graceMs = 60 * 60 * 1000L, graceKeep = 2,
      graceFloorMs = 0L)
    assert(Files.exists(Paths.get(agg, "g5")))
    assert(Files.exists(Paths.get(agg, "g4")) && Files.exists(Paths.get(agg, "g3")),
      "graceKeep newest superseded gens must get the full grace window")
    assert(!Files.exists(Paths.get(agg, "g2")) && !Files.exists(Paths.get(agg, "g1")) &&
      !Files.exists(Paths.get(agg, "g0")),
      "older superseded gens must be reclaimed once past the floor")
    // a non-numeric stray ranks OLDEST (never occupies a protected
    // slot): with floor passed it is reclaimed while g4/g3 linger
    Files.createDirectories(Paths.get(agg, "gstray"))
    GenMeta.sweep(agg, keep = "g5", graceMs = 60 * 60 * 1000L, graceKeep = 2,
      graceFloorMs = 0L)
    assert(!Files.exists(Paths.get(agg, "gstray")),
      "non-numeric gen names must rank oldest, not newest (negation overflow)")
    assert(Files.exists(Paths.get(agg, "g4")) && Files.exists(Paths.get(agg, "g3")))
    // a corrupted (partial-write) _doomed stamp must not wedge the sweep:
    // it is re-stamped now, not thrown on
    Files.createDirectories(Paths.get(agg, "g6"))
    Files.writeString(Paths.get(agg, "g6", "_doomed"), "")
    GenMeta.sweep(agg, keep = "g5", graceMs = 60 * 60 * 1000L, graceKeep = 2)
    val restamped = Files.readString(Paths.get(agg, "g6", "_doomed")).trim
    assert(restamped.nonEmpty && restamped.forall(_.isDigit),
      s"partial stamp must be rewritten, got '$restamped'")
  }

  test("sweep crash-window: a lazy reader that resolved CURRENT materializes safely across aggressive sweeps") {
    import spark.implicits._
    val agg = Files.createTempDirectory("graft_gm8").toString
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(s"$agg/g0")
    GenManifest.commit(agg, "g0", 0L, 9L)
    // the reader resolves CURRENT and builds its LAZY scan — no action
    // yet; this is exactly the window the graceFloor exists to protect
    val gen = GenManifest.currentGen(agg).get
    val lazyScan = spark.read.parquet(s"$agg/$gen")
    // the writer advances five generations, sweeping aggressively after
    // each: rank-based retention protects NOTHING (graceKeep = 0), so
    // only the graceFloor stands between the reader and a
    // FileNotFoundException mid-materialization
    (1 to 5).foreach { i =>
      Seq((1L, 10L + i)).toDF("k", "v").write.parquet(s"$agg/g$i")
      GenManifest.commit(agg, s"g$i", i * 10L, i * 10L + 9L)
      GenMeta.sweep(agg, keep = s"g$i", graceMs = 60 * 60 * 1000L, graceKeep = 0)
    }
    assert(Files.exists(Paths.get(agg, "g0", "_doomed")), "g0 must be stamped")
    // the materialization the whole discipline guarantees: succeeds with
    // the ORIGINAL generation's rows, not an error and not g5's
    assert(lazyScan.collect().map(_.getLong(1)).sorted.toSeq == Seq(10L, 20L))
    // boundary: once the floor too has passed, the dir is reclaimed
    GenMeta.sweep(agg, keep = "g5", graceMs = 60 * 60 * 1000L, graceKeep = 0,
      graceFloorMs = 0L)
    assert(!Files.exists(Paths.get(agg, "g0")), "past the floor g0 is reclaimed")
  }

  /** THE manifest-drift guard (round-15 regression class): every
    * monitor that keeps rollup generations behind a filesystem pointer
    * must (a) write the FUSED `gen\tlo\thi` manifest — never a raw
    * gen-only pointer with a `_hwm` sibling — and (b) stay readable
    * through its own dashboard path after the commit. Round 15's
    * quota-dashboard 500 happened exactly because a reader parsed the
    * raw file while the writer had moved to the fused format; this test
    * enumerates ALL `_current` writers so any future format change
    * breaks HERE, not in production. (StreamVocab/Transitions/
    * Attribution/UniqueTokens ride the store meta, not a file;
    * StreamNovelty keeps a bare `_hwm` with append-only output — both
    * contracts pinned elsewhere.) */
  test("drift guard: every filesystem-manifest monitor writes fused and reads back") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_gm8").toString

    def assertFused(dir: String, wantHwm: Boolean): Unit = {
      val raw = Files.readString(Paths.get(dir, "_current")).trim
      assert(raw.split("\t").length == 3, s"$dir: raw manifest '$raw' not fused")
      assert(!Files.exists(Paths.get(dir, "_hwm")), s"$dir: stale _hwm sibling")
      val Some((g, lo, hi)) = GenManifest.read(dir)
      assert(g.startsWith("g"))
      if (wantHwm) assert(lo != Long.MinValue && lo <= hi, s"$dir: hwm ($lo,$hi)")
    }

    // StreamQuota: commit → quota dashboard read (the round-15 breakage)
    val qdir = s"$work/quota"
    StreamQuota.applyBatch(s"$qdir/state", Map("a" -> 2L),
      Seq((1L, "a"), (2L, "a"), (3L, "a")).toDF("doc_id", "cls"), s"$qdir/out", 0L)
    assertFused(s"$qdir/state", wantHwm = true)
    val g = GenManifest.currentGen(s"$qdir/state").get
    assert(spark.read.parquet(s"$qdir/state/$g").count() == 1L)

    // StreamPsi: commit → summary
    val pdir = s"$work/psi"
    StreamPsi.applyBatch(pdir, Seq((1L, 0L), (2L, 1L)).toDF("doc_id", "bin"), 0L)
    assertFused(pdir, wantHwm = true)
    assert(StreamPsi.summary(spark, pdir, Seq(0L, 1L).toDF("bin")).count() > 0)

    // StreamBurst: commit → summary
    val bdir = s"$work/burst"
    StreamBurst.applyBatch(bdir,
      Seq((1L, "A", 100L), (2L, "A", 200L)).toDF("event_id", "event_type", "ts_s"), 0L)
    assertFused(bdir, wantHwm = true)
    StreamBurst.summary(spark, bdir).collect()

    // StreamAspect: commit → summary (tiny real PNG headers)
    def png(id: Long, w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, "image/png", bos.toByteArray)
    }
    val adir = s"$work/aspect"
    StreamAspect.applyBatch(adir,
      Seq(png(1L, 32, 32), png(2L, 64, 36)).toDF("doc_id", "mime", "payload"), 0L)
    assertFused(adir, wantHwm = true)
    assert(StreamAspect.summary(spark, adir).count() > 0)

    // StreamCalibration: commit → summary
    val docs = Seq((1L, "good clean text"), (2L, "zz spam junk")).toDF("doc_id", "text")
    val labels = Seq((1L, true), (2L, false)).toDF("doc_id", "lab")
    val (model, consts) = graft.ops.CorpusStats.nbTrain(docs, "doc_id", "text", labels)
    val cdir = s"$work/cal"
    StreamCalibration.applyBatch(model, consts, cdir,
      docs.join(labels, Seq("doc_id")), 0L)
    assertFused(cdir, wantHwm = true)
    assert(StreamCalibration.summary(spark, cdir).count() > 0)

    // StreamDecodeHealth: commit → summary
    val ddir = s"$work/dec"
    StreamDecodeHealth.applyBatch(ddir,
      Seq(png(1L, 8, 8), (2L, "image/png", Array[Byte](1, 2)))
        .toDF("doc_id", "mime", "payload"), 0L)
    assertFused(ddir, wantHwm = true)
    assert(StreamDecodeHealth.summary(spark, ddir).count() > 0)

    // StreamKmv (idempotent — sentinel hwm): commit → readState
    val kdir = s"$work/kmv"
    StreamKmv.applyBatch(Seq((1L, "alpha beta gamma delta", "g1"))
      .toDF("doc_id", "text", "grp"), "grp", "text", 4, kdir, 0L)
    assertFused(kdir, wantHwm = false)
    assert(StreamKmv.readState(spark, kdir, "grp").get.count() > 0)

    // StreamGramCoverage (idempotent — sentinel hwm): commit → readState
    val gdir = s"$work/cov"
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val probe = graft.ops.Dedup.shingleHashSets(bench, "doc_id", "text", 3)
      .select(explode(col("hs")).as("g")).distinct()
    StreamGramCoverage.applyBatch(
      Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
      "doc_id", "text", 3, probe, gdir, 0L)
    assertFused(gdir, wantHwm = false)
    assert(StreamGramCoverage.readState(spark, gdir).get.count() > 0)
  }
}
