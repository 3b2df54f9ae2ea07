package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** tokenBudget must equal the brute-force global greedy prefix for any
  * budget — including budgets that land exactly on a document boundary,
  * inside a tier, and beyond the corpus total. */
class SamplingSpec extends SparkSpec {

  test("clusterQuotaSample: exact budget, water-level evenness, determinism") {
    val corpus = Similarity.prep(
      spark.read.parquet(s"$sf0001/embeddings.parquet"), "vec_id", "embedding")
    val kept = Sampling.clusterQuotaSample(corpus, "vec_id", budget = 200L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(kept.size == 200, s"water-fill must spend the budget exactly: ${kept.size}")
    assert(kept.map(_._2).distinct.size == 200, "no row kept twice")
    // evenness: per-cluster kept counts differ by ≤1 among CAPPED clusters
    // (uncapped clusters contribute everything they have, below the level)
    val byC = kept.groupBy(_._1).view.mapValues(_.size).toMap
    val sizes = corpus.withColumn("c_id",
        Similarity.centroidBest(Similarity.trainCentroids(corpus, 8), col("q"), col("nq")))
      .groupBy("c_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = byC.filter { case (c, n) => n < sizes(c) }.values
    assert(capped.isEmpty || capped.max - capped.min <= 1,
      s"capped clusters must sit at a common water level ±1: $byC vs $sizes")
    // determinism under repartitioning
    val again = Sampling.clusterQuotaSample(corpus.repartition(7), "vec_id", budget = 200L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(again == kept, "cluster quota sampling must be partition-order-free")
    // a budget ≥ corpus keeps everything
    val all = Sampling.clusterQuotaSample(corpus, "vec_id", budget = 100000L).count()
    assert(all == corpus.count())
  }

  test("assistantSpans: alternating roles index the token tape; spans tile assistant turns exactly") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "aa bb"),      // turn 0 (user): 2 toks → tape [0,2)
      (1L, 2L, "cc"),         // turn 1 (assistant): [2,3)
      (1L, 3L, "dd ee ff"),   // turn 2 (user): [3,6)
      (1L, 4L, "gg hh"),      // turn 3 (assistant): [6,8)
      (2L, 9L, "solo")        // turn 0 only → no assistant span
    ).toDF("user_id", "event_id", "txt")
    val got = Sampling.assistantSpans(ev, "user_id", "event_id", "txt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(got == Seq((1L, 1L, 2L, 3L), (1L, 3L, 6L, 8L)), got.toString)
  }

  test("tier-histogram selection == global-window greedy prefix across budgets") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // ~5% null quality: must sort LAST (selected only once every scored
    // doc is in), matching orderBy(q desc) nulls-last
    val docs = (1L to 400L).map { id =>
      val q: Option[Double] =
        if (rnd.nextInt(20) == 0) None
        else Some(math.floor(rnd.nextDouble() * 1000) / 1000.0)
      (id, q, 10L + rnd.nextInt(90))
    }.toDF("doc_id", "q", "n_tokens")

    val w = Window.partitionBy().orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = docs.withColumn("cum", sum(col("n_tokens")).over(w))
    val total = withCum.agg(max("cum")).collect()(0).getLong(0)
    val exactBoundary = withCum.filter(col("cum") <= total / 3)
      .agg(max("cum")).collect()(0).getLong(0)

    for (budget <- Seq(0L, 500L, exactBoundary, total / 2, total, total + 1000L)) {
      val expected = withCum.filter(col("cum") <= budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val got = Sampling.tokenBudget(docs, "doc_id", "q", "n_tokens", budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expected,
        s"budget=$budget: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("quotaSample: exact per-stratum counts, deterministic, quota-monotone") {
    import spark.implicits._
    val docs = (1L to 300L).map(id => (id, s"g${id % 3}")).toDF("doc_id", "g")
    // g0/g1/g2 have 100 docs each
    val quotas = Map("g0" -> 40L, "g1" -> 150L) // g1 quota exceeds size; g2 unlisted
    def run(q: Map[String, Long]) =
      Sampling.quotaSample(docs, "doc_id", "g", q)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val got = run(quotas)
    val byG = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byG == Map("g0" -> 40, "g1" -> 100, "g2" -> 100),
      s"exact min(quota, size) per stratum, got $byG")
    assert(run(quotas) == got, "hash-rank selection is deterministic")
    // smaller quota selects a strict prefix of the larger quota's picks
    val smaller = run(Map("g0" -> 10L, "g1" -> 150L))
    assert(smaller.filter(_._2 == "g0").subsetOf(got.filter(_._2 == "g0")),
      "rank-based quotas are monotone: quota 10 ⊂ quota 40")
  }

  test("quotaSample giant stratum: tier-bucketed selection == brute-force hash-rank prefix") {
    import spark.implicits._
    // one stratum dominates (5000 of 5300 rows) — the skew shape the tier
    // bucketing exists for; quotas land inside tiers, exactly on a
    // stratum size, at 0, and unlisted (keep-all) in one run
    val docs = ((1L to 5000L).map(id => (id, "giant")) ++
        (100001L to 100200L).map(id => (id, "mid")) ++
        (200001L to 200100L).map(id => (id, "tiny")))
      .toDF("doc_id", "g")
    val quotas = Map("giant" -> 137L, "mid" -> 200L, "tiny" -> 0L)

    val ref = docs
      .withColumn("_h", Dedup.hash60(col("doc_id").cast("string")))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("_h"), col("doc_id"))))
      .filter(col("_r") <= coalesce(
        element_at(typedLit(quotas), col("g")), lit(Long.MaxValue)))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // small tier count forces multi-row tiers and a mid-tier boundary
    for (tiers <- Seq(8, 1024)) {
      val got = Sampling.quotaSample(docs, "doc_id", "g", quotas, tiers = tiers)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == ref,
        s"tiers=$tiers: missing=${(ref -- got).take(5)} extra=${(got -- ref).take(5)}")
    }
  }

  test("quotaSample does not clobber or require user columns named like its internals") {
    import spark.implicits._
    val docs = (1L to 50L).map(id => (id, s"g${id % 2}", s"keep-$id"))
      .toDF("doc_id", "g", "_q_rk") // collides with an internal name
    val out = Sampling.quotaSample(docs, "doc_id", "g", Map("g0" -> 5L))
    assert(out.columns.toSeq == Seq("doc_id", "g", "_q_rk"))
    val kept = out.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(kept.forall { case (id, v) => v == s"keep-$id" },
      "user column named like an internal must pass through untouched")
    assert(out.filter(col("g") === "g0").count() == 5)
  }

  test("packSequences == global-window tape layout; offsets tile the tape exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1L to 300L).map(id => (id, 1L + rnd.nextInt(200).toLong))
      .toDF("doc_id", "n_tokens")

    // reference: one global window in (hash, id) order
    val ref = docs
      .withColumn("_h", Dedup.hash60(col("doc_id").cast("string")))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(
        Window.partitionBy().orderBy(col("_h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("start_off"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // small bucket count forces real multi-bucket base-offset stitching
    for (buckets <- Seq(8, 1024)) {
      val got = Sampling.packSequences(docs, "doc_id", "n_tokens", seqLen = 64L,
          buckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(got.map(g => g._1 -> g._3).toMap == ref, s"buckets=$buckets")
      // the docs tile the tape: sorted by offset, each starts where the
      // previous ended, and the sequence span is the offset arithmetic
      val sorted = got.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._2 == b._3, s"gap after doc ${a._1}")
        case _ =>
      }
      got.foreach { case (id, n, off, f, l) =>
        assert(f == off / 64 && l == (off + n - 1) / 64, s"doc $id span")
      }
    }
  }

  test("quotaSample: a NULL stratum is quota-capped like any other (null-safe boundary join)") {
    import spark.implicits._
    val docs = ((1L to 40L).map(id => (id, Option("g0"))) ++
      (41L to 80L).map(id => (id, Option.empty[String])))
      .toDF("doc_id", "g")
    val out = Sampling.quotaSample(docs, "doc_id", "g",
      Map("g0" -> 7L), defaultQuota = 5L, tiers = 8)
    val counts = out.groupBy("g").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(counts == Map(Option("g0") -> 7L, None -> 5L),
      s"null stratum must be capped at defaultQuota, got $counts")
  }

  test("rebalanceToMixture: water-filled counts hit the exact integer shares") {
    import spark.implicits._
    // sizes: a=100, b=30, c=9; weights a:3, b:2, c:1 (W=6).
    // T = min(100*6/3, 30*6/2, 9*6/1) = min(200, 90, 54) = 54
    // quotas: a = 3*54/6 = 27, b = 2*54/6 = 18, c = 1*54/6 = 9 (binds)
    val docs = ((1L to 100L).map(i => (i, "a")) ++
      (101L to 130L).map(i => (i, "b")) ++
      (131L to 139L).map(i => (i, "c")) ++
      (140L to 160L).map(i => (i, "zz"))) // outside the mixture → dropped
      .toDF("doc_id", "g")
    val out = Sampling.rebalanceToMixture(docs, "doc_id", "g",
      Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 27L, "b" -> 18L, "c" -> 9L), counts.toString)

    // an empty target stratum binds T to 0: nothing survives
    val none = Sampling.rebalanceToMixture(docs, "doc_id", "g",
      Map("a" -> 1L, "missing" -> 1L))
    assert(none.count() == 0L)

    // weight×size products past 2^63 must fail loudly (multiplyExact), not
    // wrap into negative quotas that silently empty or corrupt the output;
    // these weights sum fine but size_a·W overflows
    intercept[ArithmeticException] {
      Sampling.rebalanceToMixture(docs, "doc_id", "g",
        Map("a" -> Long.MaxValue / 2, "b" -> Long.MaxValue / 2)).count()
    }
    // and an overflowing weight SUM fails at the same loudness bar
    intercept[ArithmeticException] {
      Sampling.rebalanceToMixture(docs, "doc_id", "g",
        Map("a" -> Long.MaxValue, "b" -> Long.MaxValue)).count()
    }
  }

  test("temperatureMixture: sqrt-smoothed water-fill counts; alpha=1 is the natural mixture") {
    import spark.implicits._
    // sizes: a=100, b=25, c=9 → isqrt weights 10, 5, 3 (W=18).
    // T = min(100*18/10, 25*18/5, 9*18/3) = min(180, 90, 54) = 54
    // quotas: a = 10*54/18 = 30, b = 5*54/18 = 15, c = 3*54/18 = 9 (binds)
    val docs = ((1L to 100L).map(i => (i, "a")) ++
      (101L to 125L).map(i => (i, "b")) ++
      (126L to 134L).map(i => (i, "c"))).toDF("doc_id", "g")
    val counts = Sampling.temperatureMixture(docs, "doc_id", "g", alpha = 0.5)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 30L, "b" -> 15L, "c" -> 9L), counts.toString)
    // the head's share drops toward the tail's: 100/134 → 30/54
    assert(counts("a").toDouble / counts.values.sum < 100.0 / 134.0)

    // alpha = 1: weights = sizes → T = W, quota_s = n_s — a no-op
    assert(Sampling.temperatureMixture(docs, "doc_id", "g", alpha = 1.0)
      .count() == 134L)

    // NULL strata sit outside any mixture
    val withNull = docs.unionByName(
      Seq((999L, null.asInstanceOf[String])).toDF("doc_id", "g"))
    assert(Sampling.temperatureMixture(withNull, "doc_id", "g", alpha = 1.0)
      .count() == 134L)

    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(docs, "doc_id", "g", alpha = 0.0)
    }
  }

  test("curriculumRank == global row_number on random scores, including ties and tier edges") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // scores with deliberate ties, exact tier boundaries (k/1024), 0 and 1
    val rows = (1L to 500L).map { i =>
      val q = rnd.nextInt(5) match {
        case 0 => 0.0
        case 1 => 1.0
        case 2 => rnd.nextInt(1024).toDouble / 1024 // exact tier boundary
        case _ => rnd.nextDouble()
      }
      (i, q)
    }
    val docs = rows.toDF("doc_id", "q")
    val got = Sampling.curriculumRank(docs, "doc_id", "q", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = rows.sortBy { case (id, q) => (-q, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(got == expected,
      s"diff: ${got.filter { case (k, v) => expected(k) != v }.take(5)}")
    // NULL scores are unrankable and dropped
    val withNull = docs.unionByName(
      Seq((999L, null.asInstanceOf[java.lang.Double])).toDF("doc_id", "q"))
    assert(Sampling.curriculumRank(withNull, "doc_id", "q").count() == 500L)
  }

  test("curriculumRank: score atoms split heavy tiers by a monotone sub-key, rank stays exact") {
    import spark.implicits._
    // the clamp pathology: most of the corpus saturates at exactly 0.0
    // or 1.0, plus a spread tier that also goes heavy — with
    // heavyFactor = 1 every heavy tier must sub-partition, and the rank
    // must still equal the global (score DESC, id ASC) row_number
    val rnd = new scala.util.Random(7)
    val rows = (1L to 600L).map { i =>
      val q =
        if (i % 3 == 0) 0.0
        else if (i % 3 == 1) 1.0
        else 0.25 + rnd.nextInt(4).toDouble / 10240 // heavy spread tier w/ ties
      (i, q)
    }
    val docs = rows.toDF("doc_id", "q")
    val got = Sampling.curriculumRank(docs, "doc_id", "q",
        buckets = 16, heavyFactor = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = rows.sortBy { case (id, q) => (-q, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(got == expected,
      s"diff: ${got.filter { case (k, v) => expected(k) != v }.take(5)}")

    // non-numeric ids: no monotone sub-key exists for an atom tier — the
    // documented fallback keeps one partition but stays exact
    val srows = rows.map { case (i, q) => (f"doc$i%04d", q) }
    val sgot = Sampling.curriculumRank(srows.toDF("doc_id", "q"), "doc_id", "q",
        buckets = 16, heavyFactor = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val sexp = srows.sortBy { case (id, q) => (-q, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(sgot == sexp)
  }

  test("leakageSafeSplit: near-dup pairs always share a split; singletons == hashSplit") {
    import spark.implicits._
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "spark shuffles partition data across the cluster by key ranges"),
      (3L, "completely unrelated text about gardening tools and wet soil"),
      (4L, "yet another independent document concerning astronomy and stars"))
      .toDF("doc_id", "text")
    // near-copies of each base doc under far-apart ids — plain hashSplit
    // would scatter these across splits
    val copies = base.select((col("doc_id") + 1000).as("doc_id"),
      concat(col("text"), lit(" ok")).as("text"))
    val corpus = base.unionByName(copies)
    val out = Sampling.leakageSafeSplit(corpus, "doc_id", "text",
      bands = 4, rowsPerBand = 2)
    val rows = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    for (i <- 1L to 4L) {
      assert(rows(i) == rows(i + 1000),
        s"doc $i and its near-copy must share cluster AND split: ${rows(i)} vs ${rows(i + 1000)}")
      assert(rows(i)._1 == i, "cluster label is the component's min id")
    }
    // a doc with no near-dups splits exactly like hashSplit
    val loner = Seq((77L, "a one of a kind singleton document with no twin anywhere"))
      .toDF("doc_id", "text")
    val lonerSplit = Sampling.leakageSafeSplit(corpus.unionByName(loner),
        "doc_id", "text", bands = 4, rowsPerBand = 2)
      .filter(col("doc_id") === 77L).collect().head.getString(2)
    val plain = Sampling.hashSplit(loner, "doc_id")
      .collect().head.getAs[String]("split")
    assert(lonerSplit == plain, "singletons must degrade to exactly hashSplit")
  }

  test("epochSchedule: fresh full permutation per epoch, consecutive steps, deterministic") {
    import spark.implicits._
    val ids = (0L until 97L).toDF("doc_id")
    val sched = Sampling.epochSchedule(ids, "doc_id", epochs = 3, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sched.length == 3 * 97)
    for (e <- 1 to 3) {
      val epoch = sched.filter(_._1 == e)
      assert(epoch.map(_._2).toSet == (0L until 97L).toSet,
        s"epoch $e must visit every doc exactly once")
      assert(epoch.map(_._3).sorted.toSeq == ((e - 1) * 97L + 1 to e * 97L).toSeq,
        s"epoch $e occupies its own consecutive step range")
    }
    // different epochs produce genuinely different orders
    def order(e: Long) = sched.filter(_._1 == e).sortBy(_._3).map(_._2).toSeq
    assert(order(1) != order(2) && order(2) != order(3))
    // reproducible: a second run is bit-identical (no rand() anywhere)
    val again = Sampling.epochSchedule(ids, "doc_id", epochs = 3, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(x => (x._1, x._3)).toSeq == sched.sortBy(x => (x._1, x._3)).toSeq)
  }

  test("kAnonymize == driver replay of the full-census ladder, random QIs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1L to 300L).map { id =>
      (id, s"l${rnd.nextInt(4)}", s"s${rnd.nextInt(8)}", s"b${rnd.nextInt(3)}")
    }
    val df = rows.toDF("id", "q1", "q2", "q3")
    for (k <- Seq(1L, 3L, 8L, 50L, 400L)) {
      val got = Sampling.kAnonymize(df, "id", Seq("q1", "q2", "q3"), k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
      // full-population counts per level; finest adequate level wins
      val c0 = rows.groupBy(r => (r._2, r._3, r._4)).view.mapValues(_.size.toLong).toMap
      val c1 = rows.groupBy(r => (r._2, r._3)).view.mapValues(_.size.toLong).toMap
      val c2 = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val c3 = rows.size.toLong
      val exp = rows.map { case (id, q1, q2, q3) =>
        val ns = Seq(c0((q1, q2, q3)), c1((q1, q2)), c2(q1), c3)
        val lvl = ns.indexWhere(_ >= k) match { case -1 => 3; case i => i }
        (id,
          if (lvl > 2) "*" else q1,
          if (lvl > 1) "*" else q2,
          if (lvl > 0) "*" else q3,
          lvl.toLong, ns(lvl), ns(lvl) >= k)
      }.toSet
      assert(got == exp, s"k=$k: diff=${(got -- exp).take(3)} / ${(exp -- got).take(3)}")
    }
    // k=1 keeps every row fully specific; k > N suppresses everything
    assert(Sampling.kAnonymize(df, "id", Seq("q1"), 1L)
      .filter(col("anon_level") =!= 0L).count() == 0)
    assert(Sampling.kAnonymize(df, "id", Seq("q1"), 1000L)
      .filter(col("kept")).count() == 0)
  }

  test("waterFillBudget == driver water-fill simulation across budgets") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val strata = (0 until 12).map(i => (s"dom$i", 1L + rnd.nextInt(500)))
    val docs = strata.flatMap { case (s, t) =>
      // split each stratum's tokens over a few docs (the op must sum)
      var left = t
      val parts = scala.collection.mutable.Buffer[Long]()
      while (left > 0) { val p = 1L + rnd.nextInt(200).min(left.toInt - 1).max(0); parts += p; left -= p }
      parts.map(p => (s, p))
    }.toDF("source", "n_tok")
    val totals = strata.toMap
    val sumT = totals.values.sum
    def simulate(budget: Long): Map[String, Long] = {
      // exact integer water level + one-token remainder round-robin
      val sorted = totals.toSeq.sortBy { case (s, t) => (t, s) }
      val cap =
        if (budget >= sumT) totals.values.max
        else {
          var prefix = 0L; var ans = -1L
          for (((s, t), i) <- sorted.zipWithIndex if ans < 0) {
            val cand = math.max(budget - prefix, 0L) / (sorted.size - i)
            val prev = if (i == 0) 0L else sorted(i - 1)._2
            if (prev <= cand && cand < t) ans = cand
            prefix += t
          }
          ans
        }
      val alloc0 = totals.view.mapValues(t => math.min(t, cap)).toMap
      var r = math.min(budget, sumT) - alloc0.values.sum
      val extra = totals.toSeq.filter(_._2 > cap).map(_._1).sorted.map { s =>
        val e = if (r > 0) 1L else 0L; r -= e; s -> e
      }.toMap
      totals.map { case (s, _) => s -> (alloc0(s) + extra.getOrElse(s, 0L)) }
    }
    for (budget <- Seq(0L, 17L, sumT / 10, sumT / 3, sumT - 1, sumT, sumT + 99L)) {
      val got = Sampling.waterFillBudget(docs, "source", "n_tok", budget)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      val exp = simulate(budget)
      assert(got == exp, s"budget=$budget: got=$got exp=$exp")
      assert(got.values.sum == math.min(budget, sumT), s"budget=$budget total off")
    }
  }

  test("isqrt: floor(sqrt(n)) exactly, across boundaries and random 2^52-scale inputs") {
    def check(n: Long): Unit = {
      val x = Sampling.isqrt(n)
      assert(x >= 0 && x * x <= n && (x + 1) * (x + 1) > n, s"isqrt($n) = $x")
    }
    // perfect squares and their neighbors — where a float sqrt's last
    // ulp could flip the floor
    for (k <- Seq(0L, 1L, 2L, 3L, 1000L, 1L << 20, (1L << 26) - 1);
         n <- Seq(k * k - 1, k * k, k * k + 1) if n >= 0) check(n)
    val rnd = new scala.util.Random(7)
    (1 to 10000).foreach { _ => check(math.abs(rnd.nextLong()) % (1L << 52)) }
  }

  test("epochPlan: duplicates count once, small sources saturate epochs, big ones cap") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // srcBig: 100 unique tokens (10 docs × 10 tokens); srcSmall: 10
    // unique tokens incl. an exact duplicate doc (counted once).
    val big = (1 to 10).map(i =>
      ("srcBig", (1 to 10).map(t => s"b${i}_$t").mkString(" ")))
    val small = Seq(("srcSmall", (1 to 10).map(t => s"s$t").mkString(" ")),
      ("srcSmall", (1 to 10).map(t => s"s$t").mkString(" "))) // exact dup
    val docs = (big ++ small).toDF("source", "text")
    // budget 120 < capacities (400 + 40): small saturates 4 epochs (40),
    // big gets the rest (80) = 0.8 epochs
    val got = Sampling.epochPlan(docs, "source", "text", budget = 120L, maxEpochs = 4L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("srcSmall") == ((10L, 40L, 40L, 4000000L)), got.toString)
    assert(got("srcBig") == ((100L, 400L, 80L, 800000L)), got.toString)
    // Σ alloc == budget exactly
    assert(got.values.map(_._3).sum == 120L)
  }
}
