package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // AQE coalesces post-shuffle partitions down to minPartitionSize
      // (default 1m) — at bench scale a 4-5 MB exchange collapses to 4
      // tasks even when the stage ABOVE it explodes 4.7 MB -> 81 MB of
      // pair rows (d12's candidate generate ran on 4 of 32 cores). The
      // lower floor restores reduce-side parallelism for small-input/
      // big-output stages; at cluster scale partitions sit far above
      // either floor, so this is a local-window knob, not a prod tune
      // (env-overridable for A/B).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCED_PARTITION", "128k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop sink: forces full evaluation of every output column — count()
    // would let the optimizer prune projection-only work and under-report
    def run(name: String): Option[String] =
      try {
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        None
      } catch {
        case t: Throwable => Some(t.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(200))
      } finally {
        // several pipelines localCheckpoint() stage boundaries; those
        // blocks outlive the query, and across 160+ queries × (warmup +
        // median-of-3) the accumulated blocks turn the run's tail into a
        // GC benchmark (observed: map-only queries ~2× slower by the end
        // of a full pass than in isolation). Dropping them between
        // queries is free relative to any timed query and keeps sample
        // N independent of how many queries ran before it.
        // blocking: an async removal storm would land inside the NEXT
        // query's timed window and show up as phantom spread
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }

    def timed(name: String): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = run(name)
      ((System.nanoTime() - t0) / 1e9, err)
    }

    // LOAD SENTINEL: a fixed-cost, map-only control (~0.3 s of pure CPU —
    // no parquet, no shuffle, no disk, so nothing engine-side can move
    // it) interleaved through the capture. On an idle host every sample
    // sits at the baseline; a co-tenant stealing cores shows up as
    // sentinel drift AT THE MOMENT it happened. A capture whose worst
    // sample drifts >2x its baseline flags ITSELF ("ambient":"elevated")
    // instead of costing an adjudication cycle of hand-picked controls
    // (the r18 driver capture: 587 s raw, 312 s real — m18 at 550x its
    // own spread purely from host collision).
    var sentinelFailureLogged = false
    def sentinelOnce(): Double = {
      val t0 = System.nanoTime()
      // pmod keeps the running sum ≤ 2e14 — a raw sum(xxhash64) randomly
      // overflows Long and ANSI mode turns that into a fatal throw
      try spark.range(0L, 200000000L, 1L, cpus.toInt)
        .selectExpr("sum(pmod(xxhash64(id), 1000000)) as h")
        .write.format("noop").mode("overwrite").save()
      catch {
        // NonFatal only: a control hiccup must never kill the capture,
        // but interrupts and a dead SparkContext must surface, and a
        // persistently failing sentinel must be visible in the log
        case scala.util.control.NonFatal(t) =>
          if (!sentinelFailureLogged) {
            sentinelFailureLogged = true
            System.err.println(s"[bench] load sentinel failed (ambient will read unknown): $t")
          }
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    // IO SENTINEL: the CPU control above is blind to DISK-side co-tenancy
    // — the r20 flat-CPU capture carried 2-4x transients confined to the
    // checkpoint/state-store-heavy streaming drains (WAL fsyncs on the
    // shared /tmp device) while every CPU sample sat at baseline. This
    // control writes-and-reads a small parquet round-trip on the same
    // tmpdir the drains checkpoint to, so device-side contention flags
    // the capture the way core-stealing already does.
    val ioDir = java.nio.file.Files.createTempDirectory("graft_bench_iosent").toString
    var ioSentinelFailureLogged = false
    def ioSentinelOnce(): Double = {
      val t0 = System.nanoTime()
      try {
        val p = s"$ioDir/probe"
        spark.range(0L, 200000L, 1L, 4)
          .selectExpr("id", "cast(id % 97 as string) as s")
          .write.mode("overwrite").parquet(p)
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()
      } catch {
        case scala.util.control.NonFatal(t) =>
          if (!ioSentinelFailureLogged) {
            ioSentinelFailureLogged = true
            System.err.println(s"[bench] IO sentinel failed (ambient_io will read unknown): $t")
          }
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    val sentinelEvery = 10 // one control pair per ~10 timed queries

    // Stateful streaming drains carry ~1-2s of state-store open/commit +
    // JIT machinery noise per run; these ALWAYS report the median of 3.
    val alwaysMedian = Set(
      "s01_stream_state", "s03_stream_static_join",
      "s05_stream_stream_join", "x08_lookup_join")
    // Every other query gets median-of-3 adaptively: if its first timed
    // run exceeds this threshold, two more runs decide the median — a
    // single sample on a loaded machine produced phantom 3-5x
    // "regressions" (rounds 4-5) that cost whole review cycles. Queries
    // whose first run is trivially fast keep the single sample (noise
    // there can't be mistaken for a scale problem).
    val medianThresholdSec = 0.5

    // optional comma-separated subset for local iteration, e.g.
    // SPARK_GRAFT_ONLY=d09_jaccard_maxdf,d12_containment
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // one full untimed pass first: JIT/codegen-cache/parquet-footer costs
    // land here, so ~1s run-order noise can't masquerade as a regression
    // on the sub-second shuffle-free queries
    if (warmup) names.foreach(run)

    def r3(v: Double): Double = math.round(v * 1000) / 1000.0

    // sentinel baseline: MEDIAN of 5 post-warmup runs (JIT settled).
    // Median, not min — a single lucky sample as the denominator turns
    // ordinary steady-state scatter into a phantom "elevated" flag (the
    // first r19 capture: min 0.167 s vs steady 0.4 s = a 6× ratio with
    // an idle host); the flag should fire on drift ABOVE typical, not
    // above best-ever
    val sentinelBaseline = {
      sentinelOnce()
      val bs = (1 to 5).map(_ => sentinelOnce()).filter(_ > 0).sorted
      if (bs.isEmpty) -1.0 else bs(bs.length / 2)
    }
    val ioSentinelBaseline = {
      ioSentinelOnce()
      val bs = (1 to 5).map(_ => ioSentinelOnce()).filter(_ > 0).sorted
      if (bs.isEmpty) -1.0 else bs(bs.length / 2)
    }
    val sentinelSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ioSentinelSamples = scala.collection.mutable.ArrayBuffer.empty[Double]

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val spreads = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = names.zipWithIndex.map { case (name, qi) =>
      if (qi > 0 && qi % sentinelEvery == 0) {
        sentinelSamples += sentinelOnce()
        ioSentinelSamples += ioSentinelOnce()
      }
      val first = timed(name)
      val runs =
        if (first._2.isDefined) Seq(first)
        else if (alwaysMedian(name) || first._1 >= medianThresholdSec)
          Seq(first, timed(name), timed(name))
        else Seq(first)
      runs.flatMap(_._2).headOption.foreach(errors.put(name, _))
      // a failed query must be distinguishable from a fast one: -1 marker
      val secs =
        if (runs.exists(_._2.isDefined)) -1.0
        else {
          val ts = runs.map(_._1).sorted
          if (runs.length > 1) spreads.put(name, r3(ts.last - ts.head))
          ts(ts.length / 2) // median (== the value itself for one rep)
        }
      name -> (if (secs < 0) secs else r3(secs))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val sp = spreads.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = r3(results.collect { case (_, v) if v >= 0 => v }.sum)
    val sentMaxRatio =
      if (sentinelSamples.forall(_ <= 0) || sentinelBaseline <= 0) -1.0
      else r3(sentinelSamples.filter(_ > 0).max / sentinelBaseline)
    val ambient =
      if (sentMaxRatio < 0) "unknown"
      else if (sentMaxRatio > 2.0) "elevated" else "flat"
    val sentJson = s"""{"baseline":${r3(sentinelBaseline)},"every":$sentinelEvery,""" +
      s""""max_ratio":$sentMaxRatio,"samples":[${sentinelSamples.map(r3).mkString(",")}]}"""
    val ioSentMaxRatio =
      if (ioSentinelSamples.forall(_ <= 0) || ioSentinelBaseline <= 0) -1.0
      else r3(ioSentinelSamples.filter(_ > 0).max / ioSentinelBaseline)
    // the IO round-trip has intrinsically wider spread than the pure-CPU
    // control (filesystem cache state, commit-protocol fsyncs), so its
    // flag threshold sits at 3x, not 2x
    val ambientIo =
      if (ioSentMaxRatio < 0) "unknown"
      else if (ioSentMaxRatio > 3.0) "elevated" else "flat"
    val ioSentJson = s"""{"baseline":${r3(ioSentinelBaseline)},"every":$sentinelEvery,""" +
      s""""max_ratio":$ioSentMaxRatio,"samples":[${ioSentinelSamples.map(r3).mkString(",")}]}"""

    // AUTO-ADJUDICATION: an elevated capture re-runs, in the same JVM
    // after the main pass, every query whose value exceeds 1.5x its most
    // recent recorded artifact — the isolated re-check two judge rounds
    // performed by hand, now carried in the artifact itself. The re-run
    // lands after the co-tenant spike that tripped the sentinel in every
    // observed capture; one more sentinel sample around the adjudication
    // window is recorded so a still-poisoned adjudication self-flags too.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench.json")
    def prevQueryTimes(): Map[String, Double] = {
      val explicit = sys.env.get("SPARK_GRAFT_BENCH_PREV")
        .map(java.nio.file.Path.of(_))
      val candidate = explicit.orElse {
        val dir = java.nio.file.Path.of(outPath).toAbsolutePath.getParent
        val rx = "(?:BENCH_r|bench_local_r)(\\d+)\\.json".r
        import scala.jdk.CollectionConverters._
        val files =
          try java.nio.file.Files.list(dir).iterator().asScala.flatMap { p =>
            p.getFileName.toString match {
              case rx(n) => Some((n.toInt, p))
              case _     => None
            }
          }.toSeq
          catch { case scala.util.control.NonFatal(_) => Seq.empty }
        // bench_local beats the driver capture at the same round (it is
        // the adjudicated record); max round wins across both
        if (files.isEmpty) None
        else Some(files.maxBy { case (n, p) =>
          (n, if (p.getFileName.toString.startsWith("bench_local")) 1 else 0) }._2)
      }
      candidate.flatMap { p =>
        try {
          val s = java.nio.file.Files.readString(p)
          val qi = s.indexOf("\"queries\":{")
          if (qi < 0) None
          else {
            val start = qi + "\"queries\":{".length
            val body = s.substring(start, s.indexOf('}', start))
            val pair = "\"([A-Za-z0-9_]+)\":(-?[0-9][0-9.eE+-]*)".r
            Some(pair.findAllMatchIn(body)
              .map(m => m.group(1) -> m.group(2).toDouble).toMap)
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }.getOrElse(Map.empty)
    }
    val adjudicated: Seq[(String, Double)] =
      if (ambient != "elevated" && ambientIo != "elevated") Seq.empty
      else {
        val prev = prevQueryTimes()
        val suspects = results
          .collect { case (n, v) if v > 0 && prev.getOrElse(n, -1.0) > 0 &&
            v > 1.5 * prev(n) => (n, v / prev(n)) }
          .sortBy(-_._2).map(_._1)
          .take(60) // worst offenders first; bound the tail of a fully-poisoned capture
        suspects.flatMap { n =>
          val ts = (1 to 3).map(_ => timed(n)).filter(_._2.isEmpty).map(_._1).sorted
          if (ts.isEmpty) None else Some(n -> r3(ts(ts.length / 2)))
        }
      }
    val adjSentinel = if (adjudicated.nonEmpty) {
      val s = sentinelOnce()
      if (s > 0 && sentinelBaseline > 0) r3(s / sentinelBaseline) else -1.0
    } else -1.0
    val adjJson = adjudicated.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")

    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","ambient":"$ambient","sentinel":$sentJson,"ambient_io":"$ambientIo","sentinel_io":$ioSentJson,"adjudicated":$adjJson,"adjudication_sentinel_ratio":$adjSentinel,"queries":$qs,"errors":$es,"spread":$sp,"sf":"$sfDir"}"""
    // Persist the full per-query artifact on disk (it survives any stdout
    // capture limits) and print it for human logs.
    try java.nio.file.Files.writeString(java.nio.file.Path.of(outPath), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    println(line)
    // The driver tail-captures only the last ~2000 chars of output; the
    // full line above is LONGER than that window (90+ queries), so its
    // head — including the opening brace — can never land in the capture
    // and the driver records parsed:null (rounds 3–4). The FINAL line is
    // therefore a compact summary guaranteed to fit the window whole:
    // headline metric, error count, the slowest queries, and a pointer to
    // the full artifact.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","ambient":"$ambient","sentinel_max_ratio":$sentMaxRatio,"ambient_io":"$ambientIo","io_sentinel_max_ratio":$ioSentMaxRatio,"n_queries":${results.size},"n_errors":${errors.size},"n_adjudicated":${adjudicated.size},"slowest":$slowest,"queries_file":"$outPath","sf":"$sfDir"}""")
  }
}
