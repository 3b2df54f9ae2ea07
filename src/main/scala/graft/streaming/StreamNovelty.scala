package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Shared per-micro-batch k-gram state machinery for the streaming
  * keep-first operators ([[StreamNovelty]], [[StreamSpanDedup]]): the
  * positional k-gram explode, the within-batch (doc_id, pos) winner
  * aggregate, the bucket-pruned read of the cross-batch seen set, and
  * the copy-on-write fold of the batch's first occurrences back into the
  * [[DocStateStore]]. With batches arriving in ascending doc_id order
  * the incremental rule equals the batch operators' global keep-first
  * exactly — each streaming op's oracle is its batch twin's SQL. */
private[streaming] object KgramStreamCore {

  /** Per-batch working set. `occ`/`winners`/`fresh` are persisted —
    * callers release them with [[cleanup]] in a finally block. */
  case class Prepared(occ: DataFrame, winners: DataFrame,
                      touched: Seq[Int], seen: DataFrame, fresh: DataFrame)

  def prepare(state: DocStateStore, batch: DataFrame, idCol: String,
              textCol: String, k: Int): Prepared = {
    val spark = batch.sparkSession
    val occ = batch.select(col(idCol).as("doc_id"),
        posexplode(graft.expr.hfunctions.kgram_hashes60(col(textCol), k))
          .as(Seq("i0", "h")))
      .select(col("doc_id"), (col("i0") + 1).cast("long").as("pos"), col("h"))
      .persist()
    // within-batch keep-first; winners carry their (doc_id, pos)
    val winners = occ.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
      .persist()
    // which buckets does this batch touch? (≤ buckets rows)
    val touched = winners
      .select(graft.expr.hfunctions
        .md5_shard(col("h").cast("string"), state.buckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val seen = state.readBuckets(touched)
      .map(_.select(col("id")))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("id", StringType)))))
    // winners whose k-gram no prior batch claimed
    val fresh = winners
      .join(seen.select(col("id").cast("long").as("h")), Seq("h"), "left_anti")
      .persist()
    Prepared(occ, winners, touched, seen, fresh)
  }

  /** Fold the batch's first-occurrence k-grams into the store: new
    * contents of the touched buckets = prior seen ∪ fresh. No distinct:
    * seen is unique by induction (every commit writes a union of
    * disjoint unique sets) and fresh is winners-per-h anti-joined
    * against seen — a distinct here would only add a full-state shuffle
    * per trigger. */
  def commitFresh(state: DocStateStore, p: Prepared, batchId: Long): Unit = {
    val updated = p.seen
      .unionByName(p.fresh.select(col("h").cast("string").as("id")))
    state.commit(updated, f"n$batchId%09d", p.touched)
    state.maintain()
  }

  def cleanup(p: Prepared): Unit = {
    p.occ.unpersist(); p.winners.unpersist(); p.fresh.unpersist(); ()
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
      .foreachBatch { (b: DataFrame, id: Long) => perBatch(b, id) }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckptPath)
      .start()
    q.awaitTermination()
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
    val p = KgramStreamCore.prepare(state, batch, idCol, textCol, k)
    try {
      val novel = p.fresh.groupBy(col("w.doc_id").as("doc_id"))
        .agg(count(lit(1)).as("n_novel"))
      p.occ.groupBy(col("doc_id")).agg(count(lit(1)).as("n_windows"))
        .join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_windows"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"))
        .withColumn("novelty", col("n_novel").cast("double") / col("n_windows"))
        .write.mode("append").parquet(outPath)
      KgramStreamCore.commitFresh(state, p, batchId)
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
      val winners = fps.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("w_id")).persist()
      try {
        val touched = winners
          .select(graft.expr.hfunctions.md5_shard(col("fp"), state.buckets).as("b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val seen = state.readBuckets(touched)
          .map(_.select(col("id")))
          .getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row],
            StructType(Seq(StructField("id", StringType)))))
        fps.join(winners, Seq("fp"))
          .join(seen.select(col("id").as("fp"), lit(true).as("_seen")), Seq("fp"), "left")
          .select(col("doc_id"),
            (col("doc_id") === col("w_id") &&
              !coalesce(col("_seen"), lit(false))).as("kept"))
          .write.mode("append").parquet(outPath)
        val fresh = winners
          .join(seen.select(col("id").as("fp")), Seq("fp"), "left_anti")
        state.commit(seen.unionByName(fresh.select(col("fp").as("id"))),
          f"n$batchId%09d", touched)
        state.maintain()
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
    val p = KgramStreamCore.prepare(state, batch, idCol, textCol, k)
    try {
      // duplicate starts: every occurrence of a previously-seen k-gram,
      // plus every non-winner occurrence within the batch
      val seenMark = p.seen
        .select(col("id").cast("long").as("h"), lit(true).as("_seen"))
      val dupStarts = p.occ
        .join(p.winners, Seq("h"))
        .join(seenMark, Seq("h"), "left")
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
