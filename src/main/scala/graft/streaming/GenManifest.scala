package graft.streaming

import java.nio.file.{Files, Paths}

/** Atomic generation-pointer + high-water-mark manifest for the
  * constant-size streaming rollups ([[StreamTransitions]],
  * [[StreamAttribution]], [[StreamQuota]], [[StreamAspect]],
  * [[StreamBurst]], [[StreamCalibration]], [[StreamDecodeHealth]],
  * [[StreamPsi]], [[StreamUniqueTokens]]).
  *
  * One `_current` file holds `gen\tlo\thi`, written via temp +
  * ATOMIC_MOVE, so the state advance and the redelivery detector are a
  * SINGLE commit point. The previous layout (a `_current` pointer flip
  * followed by a separate `_hwm` write) had a crash window between the
  * two files: on replay the hwm check would not skip the batch (hwm
  * stale) but the rollup generation had already folded it — the batch's
  * additive counts were double-counted. With the fused manifest a crash
  * anywhere before the move replays the batch against the OLD generation
  * (correct: the fold is deterministic and the new generation directory
  * is simply rewritten), and a crash after the move is detected as a
  * bit-exact redelivery by its (lo, hi) range and skipped.
  *
  * Reads stay compatible with the pre-fuse layout (gen-only `_current`
  * plus sibling `_hwm`) so a long-running monitor restarted across the
  * upgrade keeps its redelivery guard.
  */
object GenManifest {

  /** (generation, hwm lo, hwm hi) of the live commit, None when empty. */
  def read(dir: String): Option[(String, Long, Long)] = {
    val cur = Paths.get(dir, "_current")
    if (!Files.exists(cur)) None
    else Files.readString(cur).trim.split("\t") match {
      case Array(g, lo, hi) => Some((g, lo.toLong, hi.toLong))
      case Array(g) => // pre-fuse layout: gen-only pointer, hwm sibling
        val hwm = Paths.get(dir, "_hwm")
        if (Files.exists(hwm)) {
          val Array(lo, hi) = Files.readString(hwm).trim.split("\t").map(_.toLong)
          Some((g, lo, hi))
        } else Some((g, Long.MinValue, Long.MinValue))
      case other => throw new IllegalStateException(
        s"unparseable generation manifest in $dir: '${other.mkString("\\t")}'")
    }
  }

  /** The live generation name (directory under `dir`), None when empty. */
  def currentGen(dir: String): Option[String] = read(dir).map(_._1)

  /** The ascending-arrival contract check. Returns TRUE when the batch
    * is a bit-exact redelivery of the newest committed one (same lo/hi —
    * already folded, the caller must skip it); throws on any other
    * overlap with the high-water mark; returns false for a fresh batch. */
  def isRedelivery(dir: String, lo: Long, hi: Long, contract: String): Boolean =
    read(dir) match {
      case Some((_, pl, ph)) if lo == pl && hi == ph => true
      case Some((_, _, ph)) if lo <= ph =>
        throw new IllegalStateException(
          s"out-of-order arrival: batch range [$lo, $hi] overlaps the " +
            s"high-water mark $ph — $contract")
      case _ => false
    }

  /** THE commit point: generation pointer and hwm land in one atomic
    * move; drops a leftover pre-fuse `_hwm` sibling so stale state can
    * never shadow the manifest. */
  def commit(dir: String, gen: String, lo: Long, hi: Long): Unit = {
    IndexState.atomicWriteString(Paths.get(dir, "_current"), s"$gen\t$lo\t$hi")
    Files.deleteIfExists(Paths.get(dir, "_hwm"))
    ()
  }
}

/** The DUAL-STATE variant of [[GenManifest]]: monitors that keep a
  * bucketed per-key state in a [[DocStateStore]] NEXT TO a constant-size
  * rollup generation ([[StreamTransitions]], [[StreamAttribution]],
  * [[StreamUniqueTokens]], [[StreamVocab]]) cannot use a filesystem
  * manifest as the commit point — a crash between the store commit and
  * the manifest flip leaves the two halves disagreeing about which
  * batches folded (the per-key state says yes, the redelivery detector
  * says no → the additive rollup double-counts on replay, or computes
  * boundary terms against post-batch state). Instead the generation
  * pointer AND the high-water mark ride the store commit itself as
  * [[DocStateStore.stateMeta]] keys (Delta's `txn` action, re-expressed):
  * ONE put-if-absent txn entry (or CURRENT flip) advances the per-key
  * delta, the rollup pointer, and the redelivery range together — no
  * ordering of filesystem writes can tear them apart. */
object GenMeta {

  /** Pre-fuse filesystem hwm under `dir`: either inside a `_current`
    * manifest (gen-only or fused — [[GenManifest.read]] handles both)
    * or a bare `_hwm` file with no gen pointer (the old
    * [[StreamVocab]] layout, tab-separated `lo\thi`). */
  private def legacyHwm(dir: String): Option[(Long, Long)] =
    GenManifest.read(dir)
      .map { case (_, lo, hi) => (lo, hi) }
      .filter(_._1 != Long.MinValue)
      .orElse {
        val hwm = Paths.get(dir, "_hwm")
        if (!Files.exists(hwm)) None
        else {
          val Array(lo, hi) = Files.readString(hwm).trim.split("\t").map(_.toLong)
          Some((lo, hi))
        }
      }

  /** The live rollup generation for namespace `ns`, None when empty.
    * Falls back to the pre-fuse filesystem pointer under `legacyDir`
    * when the store carries no meta yet — a long-running monitor
    * restarted across the upgrade keeps its rollup instead of silently
    * restarting the additive totals from zero (the same back-compat
    * [[GenManifest.read]] keeps for the single-state monitors). */
  def currentGen(store: DocStateStore, ns: String, legacyDir: String): Option[String] =
    store.stateMeta(s"$ns.gen").orElse(GenManifest.currentGen(legacyDir))

  /** Ascending-arrival check against the store-resident hwm: true = the
    * batch is a bit-exact redelivery of the newest committed one (skip
    * it); throws on any other overlap; false = fresh batch. When the
    * store carries no meta yet, the pre-fuse filesystem hwm under
    * `legacyDir` is consulted so an upgrade never drops the redelivery
    * guard while per-key state is retained. */
  def isRedelivery(store: DocStateStore, ns: String, legacyDir: String,
                   lo: Long, hi: Long, contract: String): Boolean = {
    val hwm = store.stateMeta(s"$ns.hwm")
      .map { h => val Array(pl, ph) = h.split(",").map(_.toLong); (pl, ph) }
      .orElse(legacyHwm(legacyDir))
    hwm match {
      case Some((pl, ph)) =>
        if (lo == pl && hi == ph) true
        else if (lo <= ph) throw new IllegalStateException(
          s"out-of-order arrival: batch range [$lo, $hi] overlaps the " +
            s"high-water mark $ph — $contract")
        else false
      case None => false
    }
  }

  /** The meta entries a monitor attaches to its store commit. */
  def kv(ns: String, gen: String, lo: Long, hi: Long): Map[String, String] =
    Map(s"$ns.gen" -> gen, s"$ns.hwm" -> s"$lo,$hi")

  /** Reclaim superseded `g*` generation directories under `aggDir` —
    * called AFTER the commit, so a crash before it merely leaks a dir
    * that the next batch's sweep reclaims (self-healing, never load-
    * bearing). Deletion is TWO-PHASE with a grace window: the first
    * sweep that sees a superseded dir stamps a `_doomed` marker (an
    * underscore file, invisible to parquet readers) recording the
    * supersession time; only a later sweep deletes dirs whose stamp is
    * older than `graceMs`. A concurrent [[GenMeta.currentGen]] reader
    * that resolved the old pointer but has not yet materialized its
    * lazy parquet scan therefore never hits FileNotFoundException
    * mid-read — the same discipline as the store vacuum paths. Once
    * the store meta owns the pointer, any pre-fuse `_current`/`_hwm`
    * siblings are dropped so stale filesystem state can never shadow
    * the fused manifest.
    *
    * Retention is bounded by COUNT as well as age: only the
    * `graceKeep` most-recently-superseded generations get the FULL
    * grace window; older ones are reclaimable once `graceFloorMs` has
    * passed since their supersession stamp. Commit COUNT alone must
    * never delete — at seconds-level trigger cadence a gen can be
    * `graceKeep` commits deep within seconds of being superseded while
    * a reader that resolved it as CURRENT is still materializing its
    * lazy scan; the floor is the hard resolution→materialization bound
    * every reader gets. The backlog is then capped at
    * max(graceKeep, commits within graceFloorMs) directories per
    * monitor instead of one per trigger across the whole window. */
  def sweep(aggDir: String, keep: String, graceMs: Long = 10L * 60 * 1000,
            graceKeep: Int = 4, graceFloorMs: Long = 60L * 1000): Unit =
    // self-healing and never load-bearing: a failed sweep leaks dirs
    // the NEXT sweep reclaims — it must not fail the batch post-commit.
    // But a PERSISTENTLY failing sweep (permissions, IO) leaks superseded
    // generations forever, so the swallow is rate-limited-logged: one
    // line per (aggDir, exception class) per process, diagnosable
    // without turning the post-commit hook into a log storm.
    try sweepOrThrow(aggDir, keep, graceMs, graceKeep, graceFloorMs)
    catch {
      case scala.util.control.NonFatal(e) =>
        val key = s"$aggDir#${e.getClass.getName}"
        if (loggedSweepFailures.add(key))
          System.err.println(
            s"[graft] GenMeta.sweep failed for $aggDir (superseded generations " +
              s"will accumulate until a sweep succeeds): $e")
    }

  /** (aggDir, exception class) pairs already logged — bounds sweep-failure
    * logging to one line per distinct failure mode per process. */
  private val loggedSweepFailures =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[streaming] def sweepOrThrow(aggDir: String, keep: String, graceMs: Long,
                                      graceKeep: Int, graceFloorMs: Long): Unit = {
    val root = Paths.get(aggDir)
    if (!Files.exists(root)) return
    Files.deleteIfExists(root.resolve("_current"))
    Files.deleteIfExists(root.resolve("_hwm"))
    val fs = Files.list(root)
    val superseded =
      try {
        val it = fs.iterator()
        var acc = List.empty[java.nio.file.Path]
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith("g") && n != keep && Files.isDirectory(p)) acc ::= p
        }
        acc
      } finally fs.close()
    // a re-committed (replayed) generation is live again: clear any
    // stale stamp so a later supersession gets a full grace window
    Files.deleteIfExists(root.resolve(keep).resolve("_doomed"))
    val now = System.currentTimeMillis()
    // newest-first by batch id (gens are g<batchId>, monotonic);
    // non-numeric strays sort LAST (oldest) — note -(Long.MinValue)
    // would overflow back to MinValue and rank them newest
    val byRecency = superseded.sortBy { p =>
      val n = p.getFileName.toString.drop(1)
      if (n.nonEmpty && n.forall(_.isDigit)) -n.toLong else Long.MaxValue
    }
    byRecency.zipWithIndex.foreach { case (p, rank) =>
      val stamp = p.resolve("_doomed")
      val doomedAt =
        if (Files.exists(stamp)) {
          // a crash mid-write leaves a partial stamp; treat it as
          // stamped now (sweep is self-healing, never load-bearing)
          val raw = Files.readString(stamp).trim
          if (raw.nonEmpty && raw.forall(_.isDigit)) raw.toLong
          else { IndexState.atomicWriteString(stamp, now.toString); now }
        } else { IndexState.atomicWriteString(stamp, now.toString); now }
      val age = now - doomedAt
      if (age >= graceMs || (rank >= graceKeep && age >= graceFloorMs)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().forEachRemaining(f => { Files.deleteIfExists(f); () })
        finally walk.close()
      }
    }
  }
}
