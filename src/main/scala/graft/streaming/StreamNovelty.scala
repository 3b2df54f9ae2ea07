package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.nio.file.{Files, Paths}

/** Shared per-micro-batch k-gram state machinery for the streaming
  * keep-first operators ([[StreamNovelty]], [[StreamSpanDedup]]): the
  * positional k-gram explode, the within-batch (doc_id, pos) winner
  * aggregate, the bucket-pruned read of the cross-batch seen set, and
  * the O(fresh) append of the batch's first occurrences into the
  * [[DocStateStore]] ([[DocStateStore.commitAppend]] — the seen-set is
  * append-only by construction, keep-first never updates an entry).
  * With batches arriving in ascending doc_id order the incremental rule
  * equals the batch operators' global keep-first exactly — each
  * streaming op's oracle is its batch twin's SQL. That precondition is
  * ENFORCED, not assumed: [[checkAscending]] validates every batch
  * against a persisted doc_id high-water mark and fails the batch
  * loudly on out-of-order arrival (an exact redelivery of the most
  * recent batch is tolerated — at-least-once replays are expected). */
private[streaming] object KgramStreamCore {

  private val trace = sys.env.contains("GRAFT_TRACE")
  private[streaming] def timed[A](label: String)(body: => A): A =
    if (!trace) body
    else {
      val t0 = System.nanoTime()
      val r = body
      println(f"[trace] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

  /** Validate the ascending-arrival contract: the batch's min doc_id
    * must exceed the stored high-water mark (the previous batch's max).
    * Returns Some((lo, hi)) to pass to [[advanceHwm]] after the commit,
    * None for an empty batch. Throws on any out-of-order batch EXCEPT a
    * bit-exact replay of the most recent one (same lo/hi), which a
    * crashed-and-restarted at-least-once stream legitimately redelivers
    * (its fresh set then folds to ∅ against the already-committed
    * state).
    *
    * The range comes from the per-batch stats aggregate (one job shared
    * with the touched-bucket computation, no extra source scan), and it
    * covers exactly the rows whose order matters: a sub-k doc holds no
    * k-gram state and its per-doc output is order-independent, so the
    * occ domain (which omits it) is the precise validation scope for
    * novelty/span-dedup; s13 validates over every fingerprint. */
  def checkAscending(outPath: String,
                     range: Option[(Long, Long)]): Option[(Long, Long)] = {
    range.foreach { case (lo, hi) =>
      val hwmFile = Paths.get(outPath, "_hwm") // '_' prefix: invisible to parquet readers
      if (Files.exists(hwmFile)) {
        val Array(prevLo, prevHi) = Files.readString(hwmFile).trim.split("\t").map(_.toLong)
        if (lo <= prevHi && !(lo == prevLo && hi == prevHi))
          throw new IllegalStateException(
            s"out-of-order arrival: batch doc_id range [$lo, $hi] overlaps the " +
              s"high-water mark $prevHi — the streaming keep-first gates equal " +
              "their batch twins only under ascending doc_id arrival (an ordered " +
              "ingestion log); re-order the input or use the batch operator")
      }
    }
    range
  }

  /** One action returning (doc_id range, touched buckets) over a cached
    * per-batch frame: min/max for the ascending-arrival check and the
    * collect_set of bucket ids for the pruned state read share a single
    * aggregate (partial-agg reduces it to ≤ buckets values per task), so
    * the cache-fill scan is paid once, not once per question. */
  def batchStats(ids: DataFrame, idCol: String, keyCol: Column,
                 buckets: Int): (Option[(Long, Long)], Seq[Int]) = {
    val r = ids.agg(
      min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long"),
      collect_set(graft.expr.hfunctions.md5_shard(keyCol, buckets))).first()
    if (r.isNullAt(0)) (None, Seq.empty)
    else (Some((r.getLong(0), r.getLong(1))),
      r.getSeq[Int](2).sorted)
  }

  /** Persist the validated batch's doc_id range as the new high-water
    * mark — called AFTER the state commit so a crash between the two
    * replays the batch (tolerated above) rather than skipping it. */
  def advanceHwm(outPath: String, range: Option[(Long, Long)]): Unit =
    range.foreach { case (lo, hi) =>
      IndexState.atomicWriteString(Paths.get(outPath, "_hwm"), s"$lo\t$hi")
    }

  /** Per-batch working set. `occ`/`winners`/`seenHit`/`fresh` are
    * persisted — callers release them with [[cleanup]] in a finally
    * block. `seenHit` = the already-seen subset of this batch's winner
    * k-grams (≤ |winners| rows, trigger-sized); `range` feeds
    * [[advanceHwm]] after the commit. */
  case class Prepared(occ: DataFrame, winners: DataFrame,
                      touched: Seq[Int], seenHit: DataFrame, fresh: DataFrame,
                      range: Option[(Long, Long)])

  def prepare(state: DocStateStore, batch: DataFrame, idCol: String,
              textCol: String, k: Int, outPath: String): Prepared = {
    val spark = batch.sparkSession
    val occ = batch.select(col(idCol).as("doc_id"),
        posexplode(graft.expr.hfunctions.kgram_hashes60(col(textCol), k))
          .as(Seq("i0", "h")))
      .select(col("doc_id"), (col("i0") + 1).cast("long").as("pos"), col("h"))
      .persist()
    // one stats action fills the occ cache AND answers both driver
    // questions (ascending contract, touched buckets) — the contract
    // check runs before anything is written
    val (range, touched) = timed("stats")(batchStats(
      occ, "doc_id", col("h").cast("string"), state.buckets))
    checkAscending(outPath, range)
    // within-batch keep-first; winners carry their (doc_id, pos)
    val winners = occ.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
      .persist()
    val seen = timed("readBuckets")(state.readBuckets(touched)
      .map(_.select(col("id")))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("id", StringType))))))
    // membership probe WITHOUT shuffling the state: the seen-set grows
    // with distinct corpus k-grams, so a plain anti-join (which shuffles
    // BOTH sides once seen outgrows the broadcast threshold) would move
    // O(state) bytes over the wire every trigger — the read-side twin of
    // the copy-on-write commit flaw. Instead the TRIGGER-sized winner
    // keys broadcast and seen streams map-side against them; only the
    // ≤|winners| matches (`seenHit`) ever shuffle or broadcast again.
    val seenHit = seen.select(col("id").cast("long").as("h"))
      .join(broadcast(winners.select(col("h"))), Seq("h"))
      .persist()
    // winners whose k-gram no prior batch claimed
    val fresh = winners
      .join(broadcast(seenHit), Seq("h"), "left_anti")
      .persist()
    Prepared(occ, winners, touched, seenHit, fresh, range)
  }

  /** Append the batch's first-occurrence k-grams into the store as a
    * delta: write volume is O(fresh), never O(seen) — the seen-set is
    * append-only, so [[DocStateStore.commitAppend]] applies and the
    * per-trigger full-state copy-on-write rewrite is gone ([[TxnLogState]]
    * bounds the delta chains by merging heavy buckets on its
    * `maintain()` cadence). No distinct: seen is unique by induction
    * (disjoint fresh sets appended) and fresh is winners-per-h
    * anti-joined against seen. */
  def commitFresh(state: DocStateStore, p: Prepared, batchId: Long): Unit = {
    timed("commitAppend")(state.commitAppend(
      p.fresh.select(col("h").cast("string").as("id")),
      f"n$batchId%09d", p.touched))
    timed("maintain")(state.maintain())
  }

  def cleanup(p: Prepared): Unit = {
    p.occ.unpersist(); p.winners.unpersist()
    p.seenHit.unpersist(); p.fresh.unpersist(); ()
  }

  /** Drain an ordered document log (doc_id long, text string) file-by-
    * file through `perBatch`, then read back the accumulated output. */
  def drain(spark: SparkSession, inPath: String, outPath: String,
            ckptPath: String, outSchema: String)
           (perBatch: (DataFrame, Long) => Unit): DataFrame = {
    val schema = new StructType().add("doc_id", "long").add("text", "string")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inPath)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) => timed(s"perBatch $id")(perBatch(b, id)) }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckptPath)
      .start()
    timed("awaitTermination")(q.awaitTermination())
    spark.read.schema(outSchema).parquet(outPath)
  }
}

/** Streaming k-gram NOVELTY gate — [[graft.ops.Dedup.noveltyScores]]'
  * keep-first rule as an incremental per-micro-batch stage with
  * cross-batch state: a k-gram window is novel iff its k-gram has never
  * been seen in any PRIOR batch and this window is the within-batch
  * (doc_id, pos)-first occurrence. With batches arriving in ascending
  * doc_id order (an ordered ingestion log) this computes EXACTLY the
  * batch operator's global keep-first — the s11 oracle is t13's SQL.
  *
  * The seen-k-gram set lives in a [[DocStateStore]] keyed by the hash
  * string (`id`), reusing the sink's md5_shard bucketing: each batch
  * reads ONLY the buckets its own k-grams hash into (a ≤buckets-row
  * driver collect decides which), unions its first-occurrence hashes in,
  * and commits just those buckets copy-on-write — the same
  * touched-bucket contract as [[MutationStream.applyBatch]], so
  * [[TxnLogState]] brings idempotent versioned commits, optimistic
  * concurrency, and the auto-compaction cadence for free.
  *
  * Scale shape: the per-batch plan is the batch operator's (one
  * groupBy(h) min-struct aggregate with map-side partials, two uniform
  * doc_id aggregations), plus one left-anti join against only the
  * touched buckets' seen hashes. State grows with DISTINCT k-grams, not
  * corpus size, and is bucket-pruned on read — no full-state scan per
  * batch, no flatMapGroupsWithState timer state.
  */
object StreamNovelty {

  /** Process one micro-batch: append (doc_id, n_windows, n_novel,
    * novelty) rows to `outPath` and fold the batch's first-occurrence
    * k-grams into `state`. Returns the touched bucket ids. */
  def applyBatch(state: DocStateStore, batch: DataFrame, idCol: String,
                 textCol: String, k: Int, outPath: String,
                 batchId: Long): Seq[Int] = {
    val p = KgramStreamCore.timed("prepare")(
      KgramStreamCore.prepare(state, batch, idCol, textCol, k, outPath))
    try {
      KgramStreamCore.timed("output") {
        // window and novel counts in ONE aggregation: tag each occ row
        // (1,0) and each fresh winner (0,1), sum per doc — replaces two
        // groupBys plus a join (three shuffles of per-doc data) with a
        // single shuffle
        p.occ.select(col("doc_id"), lit(1L).as("w"), lit(0L).as("n"))
          .unionByName(p.fresh.select(col("w.doc_id").as("doc_id"),
            lit(0L).as("w"), lit(1L).as("n")))
          .groupBy(col("doc_id"))
          .agg(sum(col("w")).as("n_windows"), sum(col("n")).as("n_novel"))
          .withColumn("novelty", col("n_novel").cast("double") / col("n_windows"))
          .write.mode("append").parquet(outPath)
      }
      KgramStreamCore.commitFresh(state, p, batchId)
      KgramStreamCore.advanceHwm(outPath, p.range)
      p.touched
    } finally KgramStreamCore.cleanup(p)
  }

  /** Convenience drain for an ordered document log: stream `inPath`
    * (doc_id long, text string) file-by-file, gate every batch through
    * [[applyBatch]], return the accumulated per-doc novelty scores. */
  def drain(spark: SparkSession, state: DocStateStore, inPath: String,
            outPath: String, ckptPath: String, k: Int = 8): DataFrame =
    KgramStreamCore.drain(spark, inPath, outPath, ckptPath,
      "doc_id long, n_windows long, n_novel long, novelty double") {
      (b, id) => applyBatch(state, b, "doc_id", "text", k, outPath, id); ()
    }
}

/** Streaming DOC-LEVEL exact dedup — [[graft.ops.Dedup.exactGroups]]'
  * keep-first rule as an unbounded ingestion gate: a document is kept
  * iff its canonical fingerprint (lowercased, whitespace-collapsed md5 —
  * [[graft.ops.TextAnalysis.fingerprint]]) was never seen in any prior
  * batch and it is the smallest doc_id carrying that fingerprint within
  * its own batch. Completes the streaming keep-first family with
  * [[StreamNovelty]] (window-level) and [[StreamSpanDedup]]
  * (token-level): same bucketed [[DocStateStore]] state, same ordered-
  * arrival ≡ batch-operator contract, but the state is one fingerprint
  * per DISTINCT document — far smaller than the k-gram stores — and
  * unbounded by design, unlike [[StreamDedup.dedupWithinHorizon]]'s
  * watermarked event-id horizon. Output: (doc_id, kept). */
object StreamExactDedup {

  /** Process one micro-batch: append (doc_id, kept) rows to `outPath`
    * and fold the batch's first-seen fingerprints into `state`. Returns
    * the touched bucket ids. */
  def applyBatch(state: DocStateStore, batch: DataFrame, idCol: String,
                 textCol: String, outPath: String, batchId: Long): Seq[Int] = {
    val spark = batch.sparkSession
    val fps = batch.select(col(idCol).as("doc_id"),
        graft.ops.TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .persist()
    try {
      // one stats action: fills the fps cache, yields range + touched
      val (range, touched) = KgramStreamCore.batchStats(
        fps, "doc_id", col("fp"), state.buckets)
      KgramStreamCore.checkAscending(outPath, range)
      val winners = fps.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("w_id")).persist()
      try {
        val seen = state.readBuckets(touched)
          .map(_.select(col("id")))
          .getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row],
            StructType(Seq(StructField("id", StringType)))))
        // same read-side shape as KgramStreamCore.prepare: broadcast the
        // trigger-sized fingerprint set, stream the state map-side — the
        // seen-set never shuffles
        val seenHit = seen.select(col("id").as("fp"))
          .join(broadcast(winners.select(col("fp"))), Seq("fp"))
          .persist()
        fps.join(winners, Seq("fp"))
          .join(broadcast(seenHit.withColumn("_seen", lit(true))), Seq("fp"), "left")
          .select(col("doc_id"),
            (col("doc_id") === col("w_id") &&
              !coalesce(col("_seen"), lit(false))).as("kept"))
          .write.mode("append").parquet(outPath)
        val fresh = winners
          .join(broadcast(seenHit), Seq("fp"), "left_anti")
        state.commitAppend(fresh.select(col("fp").as("id")),
          f"n$batchId%09d", touched)
        seenHit.unpersist()
        state.maintain()
        KgramStreamCore.advanceHwm(outPath, range)
        touched
      } finally { winners.unpersist(); () }
    } finally { fps.unpersist(); () }
  }

  /** Convenience drain: stream an ordered document log through
    * [[applyBatch]], return the accumulated keep decisions. */
  def drain(spark: SparkSession, state: DocStateStore, inPath: String,
            outPath: String, ckptPath: String): DataFrame =
    KgramStreamCore.drain(spark, inPath, outPath, ckptPath,
      "doc_id long, kept boolean") {
      (b, id) => applyBatch(state, b, "doc_id", "text", outPath, id); ()
    }
}

/** Streaming EXACT-SUBSTRING span dedup — [[graft.ops.Dedup.dedupSpans]]
  * as an incremental stage over the same cross-batch seen-k-gram state
  * as [[StreamNovelty]]: a k-token window is cut iff its k-gram was
  * claimed by a PRIOR batch (the whole window is a restatement) or it is
  * a non-first occurrence within its own batch. Under ascending doc_id
  * arrival the cut set equals the batch operator's global keep-first
  * cover mask exactly — the s12 oracle is d15's SQL. Same scale shape as
  * s11 plus the d15 join-back (occ ⨝ winners) and the compiled
  * `remove_token_spans` rebuild per document. */
object StreamSpanDedup {

  /** Process one micro-batch: append (doc_id, n_tokens, n_removed,
    * clean_text) rows to `outPath` and fold the batch's first-occurrence
    * k-grams into `state`. Returns the touched bucket ids. */
  def applyBatch(state: DocStateStore, batch: DataFrame, idCol: String,
                 textCol: String, k: Int, outPath: String,
                 batchId: Long): Seq[Int] = {
    val p = KgramStreamCore.prepare(state, batch, idCol, textCol, k, outPath)
    try {
      // duplicate starts: every occurrence of a previously-seen k-gram,
      // plus every non-winner occurrence within the batch. seenHit is
      // trigger-sized (winners ∩ seen), so the mark join broadcasts —
      // the full state never shuffles here either.
      val seenMark = p.seenHit.withColumn("_seen", lit(true))
      val dupStarts = p.occ
        .join(p.winners, Seq("h"))
        .join(broadcast(seenMark), Seq("h"), "left")
        .filter(coalesce(col("_seen"), lit(false)) ||
          !(col("doc_id") === col("w.doc_id") && col("pos") === col("w.pos")))
        .groupBy(col("doc_id"))
        .agg(collect_list(col("pos")).as("starts"))
      batch.select(col(idCol).as("doc_id"), col(textCol).as("text"))
        .join(dupStarts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          graft.expr.hfunctions.remove_token_spans(col("text"),
            coalesce(col("starts"), lit(Array.empty[Long])), k).as("clean_text"))
        .select(col("doc_id"), col("n_tokens"),
          (col("n_tokens") - graft.ops.TextAnalysis.tokenCount(col("clean_text")))
            .as("n_removed"),
          col("clean_text"))
        .write.mode("append").parquet(outPath)
      KgramStreamCore.commitFresh(state, p, batchId)
      KgramStreamCore.advanceHwm(outPath, p.range)
      p.touched
    } finally KgramStreamCore.cleanup(p)
  }

  /** Convenience drain: stream an ordered document log through
    * [[applyBatch]], return the accumulated cleaned documents. */
  def drain(spark: SparkSession, state: DocStateStore, inPath: String,
            outPath: String, ckptPath: String, k: Int = 8): DataFrame =
    KgramStreamCore.drain(spark, inPath, outPath, ckptPath,
      "doc_id long, n_tokens long, n_removed long, clean_text string") {
      (b, id) => applyBatch(state, b, "doc_id", "text", k, outPath, id); ()
    }
}
