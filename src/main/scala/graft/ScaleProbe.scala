package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scale proof-point (SCALE.md's measured companion): derive a
  * 10× corpus (sf1) from the sf0.1 fixtures, run the shuffle-heavy /
  * index-building / admission queries once at each scale, and report
  * wall-clock and shuffle-byte ratios. A scale-safe operator should land
  * near-linear (ratio ≈ 10 for work, ≤ ~10 for shuffle); anything
  * super-linear is a candidate explosion to fix, not explain away.
  *
  * Streaming probes and trigger accounting: the streaming DRAIN probes
  * (s11 novelty, s22 snapshot diff) are trigger-MATCHED by construction
  * (their input logs are split into 3 chunks at any scale, so 10× data
  * means 10× rows per trigger, same trigger count), and
  * `s01_stream_state_matched` pins the trigger count explicitly by
  * repartitioning the mutation log to a fixed file count at both scales
  * — together they separate the per-trigger floor (constant commit cost
  * × trigger count, a cadence knob) from genuine per-byte growth, the
  * decomposition plain `s01_stream_state` (file count ∝ corpus ⇒
  * trigger count ∝ corpus) cannot make on its own.
  *
  * sf1 derivation (deterministic, seedless): 10 shifted copies of each
  * row-scaled table. Document texts get a per-copy suffix token and
  * embeddings a per-copy dimension nudge so the copies are near- but not
  * exact duplicates — the worst realistic case for the dedup family
  * (exact-dup shortcuts can't fire; LSH candidate volume is honest).
  *
  * Usage: runMain graft.ScaleProbe [sf1Dir] (default /tmp/graft_sf1).
  * The BASE fixture dir comes from SPARK_GRAFT_SF_DIR (default
  * /root/testdata/sf0.1) and the report lands at SPARK_GRAFT_PROBE_OUT
  * (default SCALE_PROBE.json in the working directory), so the probe is
  * runnable outside this machine's layout. */
object ScaleProbe {

  private val probes = Seq(
    "d04_lsh_pairs", "d08_embed_neardup_lsh", "d14_neardup_prune",
    "a13_ann_ivfpq_index", "a19_ann_ivf_delete",
    "p11_sequence_pack", "p15_span_curation_pack", "p24_incremental_ingest",
    "s01_stream_state", "t38_repetition_gate",
    "s11_stream_novelty", "s22_stream_snapshot_diff",
    // r18: the five-stage composed chain (the closest shape to the
    // production 100 TB job) and the span-dedup drain (the one slow
    // drain that had no probe row)
    "p06_full_pipeline", "s12_stream_span_dedup",
    // r19: the char-granular ExactSubstr pair — ~6× the gram volume of
    // the token form on the same corpus, so its scale shape must be
    // shown, not asserted
    "d30_char_span_dedup", "s39_stream_char_span_dedup",
    // r20: the surgical char-granular decontamination cut — claimed
    // map-only/zero-shuffle (static broadcast set, no winners agg, no
    // join-back); the probe row is the receipt (s42, its streaming
    // twin, is strictly lighter per trigger than the s39 drain already
    // probed: same kernel, no state store)
    "d33_char_decontaminate_spans")

  /** Triggers pinned at BOTH scales for the matched s01 probe: the log is
    * repartitioned to exactly this many files and drained one per
    * trigger, so a 10× corpus means 10× rows PER TRIGGER — per-trigger
    * wall growing ≤ linearly in per-trigger data is the claim under
    * test (the unmatched probe's super-linear wall is then trigger
    * count, a cadence knob, not a state-path defect). */
  private val MatchedTriggers = 8

  def main(args: Array[String]): Unit = {
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1 = args.headOption.getOrElse("/tmp/graft_sf1")
    val reportPath = java.nio.file.Path.of(
      sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "SCALE_PROBE.json"))
      .toAbsolutePath
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate() // heap comes from build.sbt's forked -Xmx (16g default)
    spark.sparkContext.setLogLevel("WARN")

    generate(spark, sf01, sf1)

    val shuffle = new SparkListener {
      @volatile var bytes = 0L
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    }
    spark.sparkContext.addSparkListener(shuffle)

    def measure(body: => Unit): (Double, Long) = {
      val b0 = shuffle.bytes
      val t0 = System.nanoTime()
      body
      val secs = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      Thread.sleep(200) // let straggler stage-completed events land
      (secs, shuffle.bytes - b0)
    }

    def once(name: String, dir: String): (Double, Long) = measure {
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    }

    /** s01 with the trigger count PINNED across scales: build the log at
      * exactly [[MatchedTriggers]] files (untimed), drain one file per
      * trigger. Only the drain is timed. */
    def onceMatchedS01(dir: String): (Double, Long) = {
      val work = graft.queries.ExtendedQueries.scratchDir("graft_probe_s01m")
      graft.core.Fixtures.eventMutations(spark, dir)
        .repartition(MatchedTriggers)
        .write.mode("overwrite").parquet(s"$work/log")
      measure {
        graft.streaming.MutationStream
          .runToCompletion(spark, SparkEntry.eventConf, s"$work/log", s"$work/run")
          .write.format("noop").mode("overwrite").save()
      }
    }

    def r2(v: Double): Double = math.round(v * 100) / 100.0 // locale-free

    println(f"${"query"}%-26s ${"sf0.1 s"}%9s ${"sf1 s"}%9s ${"wall×"}%7s " +
      f"${"sf0.1 shMB"}%11s ${"sf1 shMB"}%10s ${"sh×"}%7s")
    def report(name: String, t1: Double, t10: Double, s1: Long, s10: Long,
               extra: String = ""): String = {
      println(f"$name%-26s $t1%9.2f $t10%9.2f ${t10 / t1}%7.1f " +
        f"${s1 / 1e6}%11.1f ${s10 / 1e6}%10.1f ${
          if (s1 > 0) f"${s10.toDouble / s1}%7.1f" else "      -"}%s")
      s"""{"query":"$name","sf01_s":${r2(t1)},"sf1_s":${r2(t10)},""" +
        s""""sf01_shuffle_b":$s1,"sf1_shuffle_b":$s10$extra}"""
    }
    // incremental + resumable: each probe's row lands in a sidecar file
    // as soon as it finishes, and a probe whose sidecar already exists is
    // skipped — a killed run (wall-clock caps) resumes where it stopped
    // instead of losing everything; SPARK_GRAFT_PROBE_ONLY=a,b selects a
    // subset. The final report is assembled from the sidecars in probe
    // order so partial progress is always readable.
    val sideDir = java.nio.file.Path.of(
      sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "/tmp/graft_probe_parts"))
    java.nio.file.Files.createDirectories(sideDir)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def probeCached(name: String)(run: => String): Unit = {
      val f = sideDir.resolve(s"$name.json")
      if (!java.nio.file.Files.exists(f) && only.forall(_.contains(name)))
        java.nio.file.Files.writeString(f, run)
      ()
    }
    probes.foreach { name =>
      probeCached(name) {
        // warmup at the small scale first: JIT/codegen/session startup
        // otherwise lands entirely in the sf0.1 denominator and deflates
        // every reported wall ratio
        once(name, sf01)
        val (t1, s1) = once(name, sf01)
        val (t10, s10) = once(name, sf1)
        report(name, t1, t10, s1, s10)
      }
    }
    probeCached("s01_stream_state_matched") {
      onceMatchedS01(sf01) // warmup
      val (t1, s1) = onceMatchedS01(sf01)
      val (t10, s10) = onceMatchedS01(sf1)
      report("s01_stream_state_matched", t1, t10, s1, s10,
        s""","triggers":$MatchedTriggers""" +
          s""","sf01_per_trigger_s":${r2(t1 / MatchedTriggers)}""" +
          s""","sf1_per_trigger_s":${r2(t10 / MatchedTriggers)}""")
    }

    /** d30 at ~10% duplication — the REALISTIC second point for the
      * duplicate-volume-proportional join-back claim (the standard d30
      * probe's successor-concat fixture makes ~10/11 of windows
      * duplicates, so it measures the worst case only). Every token is
      * salted with its doc_id so windows are unique across docs AND
      * across the sf1 copy shift; every 10th doc then appends its
      * successor's salted text, injecting one genuinely duplicated run
      * per 10 docs (~9% of windows). The salted corpus is materialized
      * UNTIMED; only the dedup is measured. */
    def onceD30LowDup(dir: String, tag: String): (Double, Long) = {
      val work = graft.queries.ExtendedQueries.scratchDir(s"graft_probe_d30ld_$tag")
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val salted = d.select(col("doc_id"),
        array_join(transform(split(col("text"), "\\s+"),
          t => concat(t, lit("x"), col("doc_id"))), " ").as("text"))
      val succ = salted.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("next_text"))
      salted.join(succ, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 0 && col("next_text").isNotNull,
            concat_ws(" ", col("text"), col("next_text")))
            .otherwise(col("text")).as("text"))
        .write.mode("overwrite").parquet(s"$work/corpus")
      measure {
        graft.ops.Dedup.dedupCharSpans(
          spark.read.parquet(s"$work/corpus"), "doc_id", "text", k = 25)
          .write.format("noop").mode("overwrite").save()
      }
    }
    probeCached("d30_char_span_dedup_lowdup") {
      onceD30LowDup(sf01, "w") // warmup
      val (t1, s1) = onceD30LowDup(sf01, "a")
      val (t10, s10) = onceD30LowDup(sf1, "b")
      report("d30_char_span_dedup_lowdup", t1, t10, s1, s10)
    }
    val rows = (probes :+ "s01_stream_state_matched" :+ "d30_char_span_dedup_lowdup")
      .flatMap { name =>
      val f = sideDir.resolve(s"$name.json")
      if (java.nio.file.Files.exists(f))
        Some(java.nio.file.Files.readString(f)) else None
    }
    java.nio.file.Files.writeString(reportPath, rows.mkString("[", ",\n", "]") + "\n")
    println(s"report: $reportPath (${rows.size} rows)")
    spark.stop()
  }

  /** 10 shifted near-duplicate copies of documents/embeddings/events;
    * the dimension-like tables copy through unchanged. Ids shift by
    * copy × 10^7 (far above any fixture id), so cross-copy joins and
    * dedup behave like genuinely new data. */
  private def generate(spark: SparkSession, src: String, dst: String): Unit = {
    val done = java.nio.file.Path.of(dst, "_DONE")
    if (java.nio.file.Files.exists(done)) return
    val K = 10
    val off = 10000000L

    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until K).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * off))
        .withColumn("text",
          if (k == 0) col("text") else concat(col("text"), lit(s" c$k")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    (0 until K).map { k =>
      emb.withColumn("vec_id", col("vec_id") + lit(k * off))
        .withColumn("embedding",
          if (k == 0) col("embedding")
          else transform(col("embedding"), (v, i) =>
            when(i === (k % dim), v + lit(0.001f * k)).otherwise(v)))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    (0 until K).map { k =>
      ev.withColumn("event_id", col("event_id") + lit(k * off))
        .withColumn("user_id", col("user_id") + lit(k * off))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    java.nio.file.Files.writeString(done, "ok")
    ()
  }
}
