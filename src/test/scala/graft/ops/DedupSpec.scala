package graft.ops

import graft.SparkSpec
import graft.expr.TextHash
import org.apache.spark.sql.functions._

/** The compiled text-hash expressions (ShingleHashes60 / MinHashSig /
  * SimHash) must be value-identical to their SQL-composable reference
  * forms (the md5/conv/transform pipelines) — the DuckDB oracles are
  * generated from the reference forms. */
class DedupSpec extends SparkSpec {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog", // duplicate
    "a b c",
    "a b",              // too short for 3-grams
    "",                 // empty
    "  padded   with   spaces  ",
    "repeat repeat repeat repeat repeat",          // duplicate shingles collapse
    "tabs\tand\nnewlines mixed  in text here",
    "unicode héllo wörld 日本語 テキスト mixed ascii")

  private def docsDf = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("compiled shingle hashes == SQL-composable md5/conv form") {
    val expected = docsDf.select(col("doc_id"),
      transform(Dedup.shingles(col("text"), 3), s => Dedup.hash60(s)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val got = Dedup.shingleHashSets(docsDf, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // compiled path drops docs with no shingles; every kept doc must match
    assert(got.nonEmpty)
    got.foreach { case (id, hs) => assert(hs == expected(id), s"doc $id") }
    expected.filterNot { case (id, hs) => got.contains(id) }
      .foreach { case (id, hs) => assert(hs.isEmpty, s"doc $id dropped but had shingles") }
  }

  test("compiled minhash signature == perm-expression form") {
    val sigs = Dedup.minhashSignatures(docsDf, "doc_id", "text", k = 8, n = 3)
    val viaExpr = sigs.select(col("doc_id"),
      array((0 until 8).map(i => array_min(transform(col("hs"), h => Dedup.perm(i, h)))): _*).as("ref"),
      col("sig"))
    viaExpr.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("minhash signature values match a direct scala computation") {
    val hs = TextHash.shingleHashes60(
      org.apache.spark.unsafe.types.UTF8String.fromString(texts.head), 3)
    val sig = TextHash.minhashSig(hs, 8)
    (0 until 8).foreach { i =>
      val exp = hs.map(h => (TextHash.permA(i) * (h % TextHash.PermM) + TextHash.permB(i)) % TextHash.PermP).min
      assert(sig(i) == exp)
    }
  }

  test("hash60 matches the conv(substring(md5)) definition") {
    import spark.implicits._
    val df = texts.filter(_.nonEmpty).toDF("s")
    df.select(col("s"), Dedup.hash60(col("s")).as("sql_h")).collect().foreach { r =>
      assert(TextHash.hash60(r.getString(0)) == r.getLong(1), r.getString(0))
    }
  }

  test("lsh pairs are a subset of exact jaccard pairs and find exact dups") {
    import spark.implicits._
    val df = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((100L, "the quick brown fox jumps over the lazy dog and more"))).toDF("doc_id", "text")
    val exact = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(df, "doc_id", "text", 4, 2, 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((0L, 1L))) // identical docs always share all bands
  }

  test("editContamination catches the leetspeak rewrite the word-shingle probe can't candidate") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the green river bank every evening"),
      (2L, "spark shuffles partition data across the cluster by key ranges and merges results"),
      (3L, "a completely different note about gardening tools and wet soil in september"))
      .toDF("doc_id", "text")
    // benchmark item 1 leetspeak-rewritten: every 'e' becomes '3' — most
    // WORDS change, so word-shingle Jaccard collapses…
    val bench = corpus.filter(col("doc_id") === 1)
      .withColumn("text", translate(col("text"), "e", "3"))
    assert(Dedup.fuzzyContamination(corpus, bench, "doc_id", "text",
      n = 3, threshold = 0.5).count() == 0,
      "the word-shingle fuzzy probe must fail on within-token edits (the gap d22 fills)")
    // …while char-4-gram banding + edit verification flags exactly doc 1
    val got = Dedup.editContamination(corpus, bench, "doc_id", "text",
      k = 8, minOverlap = 0.25, editSim = 0.8, maxDist = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L)), s"got $got")
    // the verifier is a real gate: a sky-high bar rejects even the rewrite
    assert(Dedup.editContamination(corpus, bench, "doc_id", "text",
      k = 8, minOverlap = 0.25, editSim = 0.999, maxDist = 200).count() == 0)
  }

  test("editAdmission: corpus and earlier-batch blockers reject, fate-independently") {
    import spark.implicits._
    val corpus = Seq(
      (2L, "the quick brown fox jumps over the lazy dog near the green river bank every evening"),
      (4L, "spark shuffles partition data across the cluster by key ranges and merges results"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, "a completely novel document about gardening tools and wet soil in september"),
      // leetspeak re-submission of corpus doc 2 → rejected by the corpus
      (13L, "th3 quick brown fox jumps ov3r th3 lazy dog n3ar th3 gr33n riv3r bank 3v3ry 3v3ning"),
      // suffix copy of the REJECTED 13 → still rejected (fate-independent)
      (15L, "th3 quick brown fox jumps ov3r th3 lazy dog n3ar th3 gr33n riv3r bank 3v3ry 3v3ning ok"),
      // suffix copy of the ADMITTED 11 → rejected by the earlier batch doc
      (17L, "a completely novel document about gardening tools and wet soil in september ok"))
      .toDF("doc_id", "text")
    val got = Dedup.editAdmission(corpus, batch, "doc_id", "text",
      k = 8, minOverlap = 0.25, editSim = 0.8, maxDist = 200)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(11L -> true, 13L -> false, 15L -> false, 17L -> false), got.toString)
  }

  test("broadcast-index family enforces the increment/reference row bound by name") {
    import spark.implicits._
    val corpus = Seq((2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "a completely novel document about gardening tools and wet soil"),
      (13L, "another long enough unrelated sentence about distributed query engines"),
      (15L, "a third sentence exceeding the shingle width for the admission gate"))
      .toDF("doc_id", "text")
    // the guard names the bound — a corpus-sized increment must fail loudly,
    // not OOM the driver three stages later
    val e1 = intercept[IllegalArgumentException] {
      Dedup.editAdmission(corpus, batch, "doc_id", "text", maxIncrementRows = 2).count()
    }
    assert(e1.getMessage.contains("broadcast-index bound of 2 rows"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.editBenchIndex(
        Dedup.editBenchPrep(batch, "doc_id", "text", 8), maxRows = 2)
    }
    assert(e2.getMessage.contains("broadcast-index bound of 2 rows"), e2.getMessage)
    // at the bound (3 rows) both paths succeed
    assert(Dedup.editAdmission(corpus, batch, "doc_id", "text",
      maxIncrementRows = 3).count() == 3)
  }

  test("editSimilarityPairs == brute-force verification on a random corpus (candidates subset)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def doc() = (0 until (8 + rnd.nextInt(10)))
      .map(_ => "abcdef".charAt(rnd.nextInt(6)).toString * (1 + rnd.nextInt(3))).mkString(" ")
    val base = (0L until 30L).map(i => (i, doc()))
    // near-copies with 1–3 char edits for half the docs
    val edited = base.collect { case (i, t) if i % 2 == 0 =>
      (i + 1000, t.patch(rnd.nextInt(t.length), "zz".take(1 + rnd.nextInt(2)), 1))
    }
    val corpus = (base ++ edited).toDF("doc_id", "text")
    val got = Dedup.editSimilarityPairs(corpus, "doc_id", "text",
      bands = 4, rowsPerBand = 2, editSim = 0.7, maxDist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // brute-force reference over ALL pairs with plain scala levenshtein
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val texts = (base ++ edited).toMap
    val brute = (for {
      (a, ta) <- texts; (b, tb) <- texts if a < b
      dist = lev(ta, tb)
      maxLen = math.max(ta.length, tb.length)
      sim = if (maxLen == 0) 1.0 else 1.0 - dist.toDouble / maxLen
      if dist <= 100 && sim >= 0.7
    } yield (a, b) -> ((dist.toLong, maxLen.toLong, sim))).toMap
    // LSH candidates are a SUBSET of all pairs; every surfaced pair must
    // carry brute-force-exact numbers, and every true edit-copy is found
    assert(got.nonEmpty && got.keySet.subsetOf(brute.keySet),
      s"non-pairs surfaced: ${got.keySet -- brute.keySet}")
    got.foreach { case (k, v) => assert(v == brute(k), s"pair $k: $v vs ${brute(k)}") }
    // candidate recall is the band config's business (4×2 on short docs
    // misses an edit that lands on a token boundary) — but the large
    // majority of 1–2-char copies must surface, and everything surfaced
    // is brute-force exact
    val found = edited.count { case (id, _) => got.contains((id - 1000, id)) }
    assert(found * 3 >= edited.size * 2,
      s"only $found/${edited.size} edit copies found — banding is broken, not just unlucky")
  }

  // adversarial corpus for the gram-index kernel parity pins: nulls,
  // empties, sub-k texts, unicode, exact dups, near dups, a doc whose
  // grams hit MANY benchmark items, and repeated-gram texts
  private val kernelCorpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the green river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the green river bank"),
    (3L, "spark shuffles partition data across the cluster by key ranges tonight"),
    (4L, null.asInstanceOf[String]),
    (5L, ""),
    (6L, "short"), // < k = 8 chars → zero grams
    (7L, "unicode héllo wörld 日本語 テキスト mixed ascii content here today"),
    (8L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"), // one distinct gram, repeated
    (9L, "the quick brown fox jumps over the lazy dog near the green river bank extra tail"),
    (10L, "spark shuffles partition data across the cluster by key ranges tonight ok"))

  test("editContamination gram-index kernel == retired relational plan, row for row") {
    import spark.implicits._
    val corpus = kernelCorpus.toDF("doc_id", "text")
    // benchmark: leetspeak rewrites + an unrelated item + a unicode item
    val bench = corpus.filter(col("doc_id").isin(1, 3, 7))
      .withColumn("text", translate(col("text"), "e", "3"))
    for ((ov, sim) <- Seq((0.25, 0.8), (0.1, 0.5), (0.6, 0.95))) {
      val prepared = Dedup.editBenchPrep(bench, "doc_id", "text", k = 8)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id", "bench_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getDouble(5))).toSeq
      val kernel = rows(Dedup.editContaminationPrepared(corpus, prepared,
        "doc_id", "text", k = 8, minOverlap = ov, editSim = sim, maxDist = 200))
      val relational = rows(Dedup.editContaminationRelational(corpus, prepared,
        "doc_id", "text", k = 8, minOverlap = ov, editSim = sim, maxDist = 200))
      assert(kernel == relational, s"ov=$ov sim=$sim:\n$kernel\nvs\n$relational")
      assert(kernel.nonEmpty || ov > 0.5, s"ov=$ov sim=$sim surfaced nothing")
    }
  }

  test("editAdmission gram-index kernel == plain-scala model (incl. sampleMod)") {
    import spark.implicits._
    val corpus = kernelCorpus.toDF("doc_id", "text")
    val batch = Seq(
      (11L, "a completely novel document about gardening tools and wet soil"),
      (13L, "th3 quick brown fox jumps ov3r th3 lazy dog n3ar th3 gr33n riv3r bank"),
      (15L, "a completely novel document about gardening tools and wet soil ok"),
      (17L, null.asInstanceOf[String]),
      (19L, "tiny"),
      (21L, "spark shuffles partition data across the cluster by key ranges tonight"))
      .toDF("doc_id", "text")
    for (sampleMod <- Seq(1, 2)) {
      val got = Dedup.editAdmission(corpus, batch, "doc_id", "text",
          k = 8, minOverlap = 0.25, editSim = 0.8, maxDist = 200,
          gramSampleMod = sampleMod)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      // independent model: exact bar + bounded-DP semantics in plain scala
      def grams(t: String) =
        if (t == null) Array.emptyLongArray
        else TextHash.charShingles60(t, 8, sampleMod)
      def blocks(a: String, b: String): Boolean = {
        val (ga, gb) = (grams(a), grams(b))
        if (ga.isEmpty || gb.isEmpty) return false
        val hits = ga.toSet.intersect(gb.toSet).size
        if (hits.toDouble < math.min(ga.length, gb.length).toDouble * 0.25) return false
        val dist = TextHash.boundedLevenshtein(a, b, 200)
        if (dist < 0) return false
        val maxLen = math.max(a.codePointCount(0, a.length), b.codePointCount(0, b.length))
        maxLen == 0 || 1.0 - dist.toDouble / maxLen >= 0.8
      }
      val corpusTexts = kernelCorpus.collect { case (_, t) if t != null => t }
      val batchRows = Seq(11L -> "a completely novel document about gardening tools and wet soil",
        13L -> "th3 quick brown fox jumps ov3r th3 lazy dog n3ar th3 gr33n riv3r bank",
        15L -> "a completely novel document about gardening tools and wet soil ok",
        17L -> null.asInstanceOf[String], 19L -> "tiny",
        21L -> "spark shuffles partition data across the cluster by key ranges tonight")
      val expected = batchRows.map { case (id, t) =>
        val rejected = t != null &&
          (corpusTexts.exists(c => blocks(c, t)) ||
            batchRows.exists { case (aId, at) => aId < id && at != null && blocks(at, t) })
        id -> !rejected
      }.toMap
      assert(got == expected, s"sampleMod=$sampleMod: $got vs $expected")
      if (sampleMod == 1)
        assert(got(13L) == false && got(21L) == false && got(15L) == false && got(11L),
          s"the designed verdicts must hold at sampleMod=1: $got")
    }
  }

  test("bounded_levenshtein == builtin levenshtein(a, b, t) on random pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def word() = (0 until (1 + rnd.nextInt(40)))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = (0 until 200).map { _ => (word(), word()) } ++
      Seq(("", ""), ("", "abc"), ("same", "same"))
    val df = pairs.toDF("a", "b")
    for (t <- Seq(0, 1, 3, 10, 1000)) {
      val rows = df.select(
        graft.expr.hfunctions.bounded_levenshtein(col("a"), col("b"), t).as("k"),
        levenshtein(col("a"), col("b"), t).cast("long").as("ref")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"t=$t row=$r"))
    }
  }

  test("editSimilarityPairs: suffix copies verify at 0.9; maxDist bounds; sims exact") {
    import spark.implicits._
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "spark shuffles partition data across the cluster by key ranges nightly"),
      (2L, "completely unrelated short text about gardening tools and wet soil"))
      .toDF("doc_id", "text")
    val noisy = base.select((col("doc_id") + 100).as("doc_id"),
      concat(col("text"), lit(" ok")).as("text"))
    val corpus = base.unionByName(noisy)

    val pairs = Dedup.editSimilarityPairs(corpus, "doc_id", "text",
      bands = 4, rowsPerBand = 2, editSim = 0.9, maxDist = 200)
    val got = pairs.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    // every original pairs with its 3-char-edit copy, dist exactly 3
    val expected = base.collect().map { r =>
      val len = r.getString(1).length + 3
      (r.getLong(0), r.getLong(0) + 100, 3L, len.toLong, 1.0 - 3.0 / len)
    }.toSet
    assert(got.toSet == expected, s"got $got")

    // the bounded DP drops pairs beyond maxDist — at maxDist=2 the
    // 3-edit copies vanish entirely (dist reported as -1, filtered)
    assert(Dedup.editSimilarityPairs(corpus, "doc_id", "text",
      bands = 4, rowsPerBand = 2, editSim = 0.0, maxDist = 2).count() == 0)

    // verification is the gate, not just candidacy: at editSim > attainable
    // similarity nothing survives even though band candidates exist
    assert(Dedup.editSimilarityPairs(corpus, "doc_id", "text",
      bands = 4, rowsPerBand = 2, editSim = 0.999, maxDist = 200).count() == 0)

    // no cartesian anywhere — candidates come from the band join only
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("simhashPairs: pigeonhole recall — every pair inside the Hamming ball is found") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet").select(col("doc_id"), col("text"))
    val noisy = d.select((col("doc_id") + 200000).as("doc_id"),
      concat(lit("  "), col("text"), lit("   ")).as("text"))
    val all = d.unionByName(noisy)
    val fp = all.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
    val a = fp.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = fp.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("hamming", expr("bit_count(a_sh ^ b_sh)").cast("long"))
      .filter(col("hamming") <= 3)
      .select("a_id", "b_id", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.simhashPairs(all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "noisy copies guarantee hamming-0 pairs")
    assert(banded == brute, "pigeonhole makes banded == brute, no probability involved")
  }

  test("simhashPairs maxBucket: over-cap buckets dropped deterministically, light pairs kept") {
    import spark.implicits._
    // hostile fixture: a 40-copy identical cluster (one heavy bucket per
    // band) plus one genuinely-near-dup light pair with distinct texts
    val heavy = (1L to 40L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val light = Seq(
      (100L, "spark shuffles partition data across the cluster by key ranges"),
      (101L, "  spark shuffles partition data across the cluster by key ranges ")).toDF("doc_id", "text")
    val all = heavy.unionByName(light)
    val uncapped = Dedup.simhashPairs(all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.simhashPairs(all, "doc_id", "text", maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // uncapped finds all 40·39/2 heavy pairs; the cap drops exactly those
    // (every band bucket of the heavy cluster holds 40 > 10) and keeps
    // the light pair if its fingerprints agree on any under-cap band
    assert(uncapped.count(p => p._1 <= 40 && p._2 <= 40) == 40 * 39 / 2)
    assert(capped.forall(p => p._1 > 40 || p._2 > 40),
      s"heavy-cluster pairs must be dropped by the cap: $capped")
    assert(capped == uncapped.filter(p => p._1 > 40 || p._2 > 40),
      "cap must not change any pair outside the heavy buckets")
    assert(uncapped.contains((100L, 101L)),
      "fixture must actually contain a light near-dup pair for the test to bite")
  }

  test("containmentPairs: extended copies contained at 1.0; asymmetric by construction") {
    import spark.implicits._
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different document about spark shuffles and joins"))
      .toDF("doc_id", "text")
    // doc+100 = doc's text plus a long tail → original ⊂ extension
    val ext = base.select((col("doc_id") + 100).as("doc_id"),
      concat(col("text"), lit(" plus twelve extra tail tokens q w e r t y u i")).as("text"))
    val got = Dedup.containmentPairs(base.unionByName(ext), "doc_id", "text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    // each original is fully contained in its extension, never vice versa
    // (the tail dilutes the reverse direction below 0.8), and the two
    // unrelated docs never pair
    assert(got.map(t => (t._1, t._2)) == Set((1L, 101L), (2L, 102L)), s"got $got")
    assert(got.forall(_._3 == 1.0), s"full containment must score exactly 1.0: $got")
  }

  test("containmentPairs capAdjusted: boilerplate-heavy near-copies pair on the distinctive remainder") {
    import spark.implicits._
    // every doc ends in the same 8-token boilerplate (shingle df = 10 > cap);
    // docs 1 and 2 share a 6-token distinctive head, docs 3..10 are unique
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val dup = "shared distinct phrase tokens one two"
    val corpus = (Seq((1L, s"$dup $boiler"), (2L, s"$dup $boiler")) ++
      (3 to 10).map(i => (i.toLong, s"u$i f$i w$i o$i x$i y$i $boiler")))
      .toDF("doc_id", "text")
    // default mode: inter sees only post-cap shingles but n_a is the full
    // set — 6/12 = 0.5 < 0.8, the duplicate pair is invisible
    val strict = Dedup.containmentPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.8, maxDf = Some(5))
    assert(strict.count() == 0, "full-denominator mode suppresses boilerplate-heavy docs")
    // capAdjusted: n_a counts survivors only — the pair scores exactly 1.0
    // in both directions; the unrelated docs still never pair
    val adj = Dedup.containmentPairs(corpus, "doc_id", "text",
        n = 3, threshold = 0.8, maxDf = Some(5), capAdjusted = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4))).toSet
    assert(adj.map(t => (t._1, t._2)) == Set((1L, 2L), (2L, 1L)), s"got $adj")
    assert(adj.forall(_._4 == 1.0), s"post-cap denominator must equal inter here: $adj")
    assert(adj.forall(_._3 == 6L), s"6 surviving shingles per side: $adj")
  }

  test("minhashConfigFor: threshold-derived band layout meets the miss target") {
    def miss(t: Double, br: (Int, Int)) =
      math.pow(1 - math.pow(t, br._2), br._1)
    val at05 = Dedup.minhashConfigFor(0.5)
    val at08 = Dedup.minhashConfigFor(0.8)
    val at09 = Dedup.minhashConfigFor(0.9)
    for ((t, br) <- Seq(0.5 -> at05, 0.8 -> at08, 0.9 -> at09)) {
      assert(br._1 * br._2 <= 64, s"$br must fit the signature budget")
      assert(miss(t, br) <= 1e-4, s"recall target violated at $t by $br")
    }
    // sharper thresholds buy more rows per band → fewer background
    // band collisions (candidate volume on non-duplicate pairs)
    assert(at08._2 >= 3, s"0.8 should get multi-row bands, got $at08")
    assert(at09._2 > at08._2, s"0.9 must out-sharpen 0.8: $at09 vs $at08")
    def bg(br: (Int, Int)) = br._1 * math.pow(0.2, br._2)
    assert(bg(at09) < bg(at08) && bg(at08) < bg(at05),
      s"background collisions must fall as the threshold rises")
  }

  test("jaccardPairs == brute-force set Jaccard on a random corpus, with and without maxDf") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val base = (1L to 30L).map { id =>
      val n = 5 + rnd.nextInt(6)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // near-copies (one appended token) guarantee pairs above threshold
    val corpus = base ++ base.take(15).map { case (id, t) =>
      (id + 100, t + " " + vocab(rnd.nextInt(vocab.size)))
    }
    val df = corpus.toDF("doc_id", "text")
    def shingleSet(t: String): Set[String] =
      t.split("\\s+").toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val sets = corpus.map { case (id, t) => id -> shingleSet(t) }.filter(_._2.nonEmpty)

    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size if inter > 0
      uni = sa.size + sb.size - inter
      if inter.toDouble / uni >= 0.5
    } yield (a, b, inter.toLong, uni.toLong)).toSet
    val got = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(expected.nonEmpty && got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")

    // capped: inter counts only shingles with corpus df <= cap, the
    // denominators stay the FULL set sizes (the documented semantics)
    val cap = 3
    val dfCount = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val expectedCapped = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).count(dfCount(_) <= cap) if inter > 0
      uni = sa.size + sb.size - inter
      if inter.toDouble / uni >= 0.2
    } yield (a, b, inter.toLong, uni.toLong)).toSet
    val gotCapped = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.2, maxDf = Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotCapped == expectedCapped,
      s"missing=${(expectedCapped -- gotCapped).take(5)} extra=${(gotCapped -- expectedCapped).take(5)}")
  }

  test("dedupParagraphs: globally-first occurrence wins, repeats vanish, docs rebuild in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha one\nshared boilerplate\nbeta two"),
      (2L, "SHARED   Boilerplate\ngamma three"), // formatting noise ≡ same paragraph
      (3L, "shared boilerplate"),                // all-dup doc → empty rebuild
      (4L, "  \n\ndelta four\n"))                // blank paragraphs don't count
      .toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 3L, "alpha one\nshared boilerplate\nbeta two")))
    // doc 2 loses the boilerplate (doc 1 got there first) but keeps the rest
    assert(out(2L) == ((2L, 1L, "gamma three")))
    assert(out(3L) == ((1L, 0L, "")), "an all-duplicate doc must survive with empty text")
    assert(out(4L) == ((1L, 1L, "delta four")))
  }

  test("fuzzyContamination: catches the rewrite the exact probe dilutes; == exact bipartite Jaccard") {
    import spark.implicits._
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bench = Seq(1L -> benchText).toDF("doc_id", "text")
    val corpus = Seq(
      100L -> (benchText + " extra tail"),  // near-copy: high Jaccard
      200L -> "one two three four five six seven eight nine ten",
      300L -> "alpha beta different words entirely here now today maybe soon")
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyContamination(corpus, bench, "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    // exact reference: 3-gram shingle sets, pairwise Jaccard
    def sh(t: String) = t.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")).toSet
    val expected = (for {
      (cid, ct) <- Seq(100L -> (benchText + " extra tail"),
        200L -> "one two three four five six seven eight nine ten",
        300L -> "alpha beta different words entirely here now today maybe soon")
      inter = sh(ct).intersect(sh(benchText)).size
      uni = sh(ct).union(sh(benchText)).size
      j = inter.toDouble / uni
      if j >= 0.5
    } yield (cid, 1L, j)).toSet
    assert(out == expected, s"got $out want $expected")
    assert(out.exists(_._1 == 100L), "the near-copy must be flagged")
    assert(!out.exists(_._1 == 300L), "a shared-prefix doc below threshold stays clean")
  }

  test("dedupSpans: first occurrence survives, cross-doc and intra-doc runs are cut") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c d e f",                 // every window is a winner
      2L -> "x y a b c d e f z",           // doc 1's run embedded → cut
      3L -> "p q r p q r p q r")           // intra-doc repeats → cut
      .toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((6L, 0L, "a b c d e f")))
    // doc 2's windows at pos 3..6 duplicate doc 1 → tokens 3..8 covered
    assert(out(2L) == ((9L, 6L, "x y z")), out(2L).toString)
    // doc 3: "p q r"@4,7, "q r p"@5, "r p q"@6 duplicate pos 1,2,3 →
    // tokens 4..9 covered, the first period survives
    assert(out(3L) == ((9L, 6L, "p q r")), out(3L).toString)
  }

  test("noveltyScores: per-doc fraction of globally-first windows") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c d e f",
      2L -> "x y a b c d e f z",
      3L -> "p q r p q r p q r",
      4L -> "m")                           // < k tokens: no windows, no row
      .toDF("doc_id", "text")
    val out = Dedup.noveltyScores(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 4L, 1.0)), out.toString)
    // doc 2: 7 windows, 4 duplicate doc 1's (pos 3..6) → 3 novel
    assert(out(2L) == ((7L, 3L, 3.0 / 7)), out.toString)
    // doc 3: intra-doc repeats — only the first period's 3 windows win
    assert(out(3L) == ((7L, 3L, 3.0 / 7)), out.toString)
    assert(!out.contains(4L))
  }

  test("dedupSpans == naive reference on a random corpus") {
    import spark.implicits._
    val k = 3
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val corpus = (1L to 40L).map { i =>
      i -> Vector.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // naive: global first occurrence per k-gram string, cover mask per doc
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toVector }.toMap
    val occs = corpus.flatMap { case (id, _) =>
      val tk = toks(id)
      (0 to tk.length - k).map(i => (tk.slice(i, i + k).mkString(" "), id, i))
    }
    val winner = occs.groupBy(_._1).map { case (g, os) =>
      g -> os.map(o => (o._2, o._3)).min
    }
    val expected = corpus.map { case (id, _) =>
      val tk = toks(id)
      val covered = Array.fill(tk.length)(false)
      (0 to tk.length - k).foreach { i =>
        val g = tk.slice(i, i + k).mkString(" ")
        if (winner(g) != ((id, i))) (i until math.min(tk.length, i + k)).foreach(covered(_) = true)
      }
      val clean = tk.indices.filterNot(covered).map(tk).mkString(" ")
      id -> ((tk.length.toLong, covered.count(identity).toLong, clean))
    }.toMap
    val out = Dedup.dedupSpans(corpus.toDF("doc_id", "text"), "doc_id", "text", k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == expected,
      s"mismatches: ${out.keySet.filter(i => out(i) != expected(i)).toSeq.sorted
        .map(i => s"$i: got ${out(i)} want ${expected(i)}").mkString("; ")}")
  }

  test("dedupCharSpans: cross-doc char runs cut at the non-first site, survivors fuse") {
    import spark.implicits._
    // doc 1 owns "abcdefgh"; doc 2 restates it mid-text with no token
    // boundary alignment — the char windows catch it, and the cut fuses
    // doc 2's neighbors directly (no re-spacing)
    val docs = Seq(
      (1L, "abcdefgh tail one"),
      (2L, "xx abcdefgh yy"),
      (3L, "  spaced   out  text  "), // normalization: collapsed + trimmed
      (4L, "shrt")                    // shorter than k → untouched
    ).toDF("doc_id", "text")
    val out = Dedup.dedupCharSpans(docs, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((17L, 0L, "abcdefgh tail one")))
    // doc 2 normalized = "xx abcdefgh yy" (14 chars); duplicate windows at
    // 1-based starts 4..8 ("abcde".."efgh ") cover chars 4..12 → "xx "
    // fuses with "yy" directly
    assert(out(2L) == ((14L, 9L, "xx yy")), out(2L).toString)
    assert(out(3L) == ((15L, 0L, "spaced out text")), out(3L).toString)
    assert(out(4L) == ((4L, 0L, "shrt")))
  }

  test("dedupCharSpans == naive char-level reference on a random corpus") {
    import spark.implicits._
    val k = 4
    val rnd = new scala.util.Random(19)
    val alpha = "abc"
    val corpus = (1L to 40L).map { i =>
      // random chars with random space runs so ws-normalization is exercised
      val sb = new StringBuilder
      (0 until 8 + rnd.nextInt(40)).foreach { _ =>
        if (rnd.nextInt(6) == 0) sb.append(" " * (1 + rnd.nextInt(3)))
        else sb.append(alpha(rnd.nextInt(alpha.length)))
      }
      i -> sb.toString
    }
    def norm(s: String) = s.trim.split("\\s+").mkString(" ")
    val nrm = corpus.map { case (id, t) => id -> norm(t) }.toMap
    // naive: global first occurrence per k-char substring (lexicographic
    // (doc_id, pos)), char cover mask per doc, direct concat of survivors
    val occs = corpus.flatMap { case (id, _) =>
      val t = nrm(id)
      (0 to t.length - k).map(i => (t.substring(i, i + k), id, i))
    }
    val winner = occs.groupBy(_._1).map { case (g, os) =>
      g -> os.map(o => (o._2, o._3)).min
    }
    val expected = corpus.map { case (id, _) =>
      val t = nrm(id)
      val covered = Array.fill(t.length)(false)
      (0 to t.length - k).foreach { i =>
        val g = t.substring(i, i + k)
        if (winner(g) != ((id, i))) (i until math.min(t.length, i + k)).foreach(covered(_) = true)
      }
      val clean = t.indices.filterNot(covered).map(t.charAt).mkString
      id -> ((t.length.toLong, covered.count(identity).toLong, clean))
    }.toMap
    val out = Dedup.dedupCharSpans(corpus.toDF("doc_id", "text"), "doc_id", "text", k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == expected,
      s"mismatches: ${out.keySet.filter(i => out(i) != expected(i)).toSeq.sorted
        .map(i => s"$i: got ${out(i)} want ${expected(i)}").mkString("; ")}")
    // the fixture must actually exercise the cut
    assert(expected.values.exists(_._2 > 0), "random corpus produced no duplicate char spans")
  }

  test("dedupCharSpans: rolling-hash kernel ≡ md5 kernel (equality classes, not hash values)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val alpha = "abcd"
    val corpus = (1L to 60L).map { i =>
      val sb = new StringBuilder
      (0 until 10 + rnd.nextInt(60)).foreach { _ =>
        if (rnd.nextInt(7) == 0) sb.append(' ')
        else sb.append(alpha(rnd.nextInt(alpha.length)))
      }
      i -> sb.toString
    }
    val df = corpus.toDF("doc_id", "text")
    def run(rolling: Boolean) =
      Dedup.dedupCharSpans(df, "doc_id", "text", k = 5, rollingHash = rolling)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val md5 = run(rolling = false)
    val roll = run(rolling = true)
    assert(md5 == roll, s"kernels diverged: ${
      md5.keySet.filter(i => md5(i) != roll(i)).toSeq.sorted
        .map(i => s"$i: md5 ${md5(i)} roll ${roll(i)}").mkString("; ")}")
    assert(md5.values.exists(_._2 > 0), "fixture produced no cuts")
    // the rolling kernel is positionally framed exactly like the md5 one
    val a = TextHash.charKgramHashesRolling("ab cd ef gh", 4)
    val b = TextHash.charKgramHashes60("ab  cd ef  gh ", 4) // ws-normalizes to the same text
    assert(a.length == b.length, "both kernels must emit one hash per normalized char window")
    // rolling values are self-consistent across restatements of the gram
    val x = TextHash.charKgramHashesRolling("abcde fghij abcde", 5)
    assert(x(0) == x(12), "the same 5-gram must hash equal wherever it sits")
  }

  test("duplicateRuns == naive maximal cover-mask runs on a random corpus") {
    import spark.implicits._
    val k = 3
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val corpus = (1L to 40L).map { i =>
      i -> Vector.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // naive: cover mask from raw duplicate windows, then its contiguous
    // true-segments — the definition duplicateRuns' merge must equal
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toVector }.toMap
    val occs = corpus.flatMap { case (id, _) =>
      val tk = toks(id)
      (0 to tk.length - k).map(i => (tk.slice(i, i + k).mkString(" "), id, i))
    }
    val winner = occs.groupBy(_._1).map { case (g, os) =>
      g -> os.map(o => (o._2, o._3)).min
    }
    val expected = corpus.flatMap { case (id, _) =>
      val tk = toks(id)
      val covered = Array.fill(tk.length)(false)
      (0 to tk.length - k).foreach { i =>
        val g = tk.slice(i, i + k).mkString(" ")
        if (winner(g) != ((id, i))) (i until math.min(tk.length, i + k)).foreach(covered(_) = true)
      }
      // contiguous true-segments, reported as 1-based inclusive extents
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var j = 0
      while (j < tk.length) {
        if (covered(j)) {
          val s = j
          while (j < tk.length && covered(j)) j += 1
          runs += ((id, (s + 1).toLong, j.toLong, (j - s).toLong))
        } else j += 1
      }
      runs
    }.toSet
    val got = Dedup.duplicateRuns(corpus.toDF("doc_id", "text"), "doc_id", "text", k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"extra: ${(got -- expected).toSeq.sorted}; missing: ${(expected -- got).toSeq.sorted}")
    assert(expected.nonEmpty, "the random corpus must actually contain duplicated runs")
    // a shared m-token run merges to ONE row of length m, never window counts
    assert(got.forall(_._4 >= k), s"every run is at least k long: $got")
  }

  test("contaminationHitsBloom == contaminationHits even with a pathologically small filter") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet").select(col("doc_id"), col("text"))
    val bench = d.filter(col("doc_id") < 20)
    val corpus = d.filter(col("doc_id") >= 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val exact = rows(Dedup.contaminationHits(corpus, bench, "doc_id", "text", n = 3, minHits = 5))
    // 256 bits for thousands of benchmark shingles → the filter is
    // saturated and nearly every probe is a false positive; the exact
    // verify join must still reproduce the exact output
    val tiny = rows(Dedup.contaminationHitsBloom(corpus, bench, "doc_id", "text",
      n = 3, minHits = 5, estBenchShingles = 16L, numBits = 256L))
    assert(tiny == exact, "a saturated Bloom must not change the output")
    val sized = rows(Dedup.contaminationHitsBloom(corpus, bench, "doc_id", "text",
      n = 3, minHits = 5))
    assert(sized == exact)
    assert(exact.exists(_._4), "fixture must actually contain contaminated docs")
    // empty benchmark: NULL blob → no candidates → all clean, no rows lost
    val none = rows(Dedup.contaminationHitsBloom(corpus, bench.limit(0), "doc_id", "text"))
    assert(none.size == exact.size && none.forall(r => r._3 == 0L && !r._4),
      "an empty benchmark folds to a NULL filter and every doc is clean")
  }

  test("decontaminateSpans cuts exactly the quoted benchmark spans, keeps the rest") {
    import spark.implicits._
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      // quotes the full benchmark sentence mid-document
      (100L, "intro words here the quick brown fox jumps over the lazy dog outro words here"),
      // clean document — must pass through untouched
      (101L, "entirely unrelated content about spark shuffles and joins today"),
      // quotes only a sub-k fragment (3 tokens < k) — NOT contaminated
      (102L, "the quick brown something else entirely different now appears here"))
      .toDF("doc_id", "text")
    val got = Dedup.decontaminateSpans(corpus, bench, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(100L)._3 == "intro words here outro words here",
      s"the quoted 9-token span must be excised in full: ${got(100L)}")
    assert(got(100L)._2 == 9L)
    assert(got(101L) == ((9L, 0L, "entirely unrelated content about spark shuffles and joins today")),
      s"clean docs pass through: ${got(101L)}")
    assert(got(102L)._2 == 0L,
      s"a sub-k fragment shares no k-gram and is not contamination: ${got(102L)}")
  }

  test("nearDupPrune keeps the longest doc per cluster and every singleton") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      10L -> base,                        // cluster with 11, 12
      11L -> (base + " extra"),           // longer → the representative
      12L -> base,
      20L -> "one two three four five six seven eight nine ten",
      30L -> "completely different words entirely unrelated content here now today yes")
      .toDF("doc_id", "text")
    val kept = Dedup.nearDupPrune(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 11 is the longest member of cluster {10,11,12} (label = min id = 10)
    assert(kept.contains((11L, 10L, 3L)), s"got $kept")
    assert(!kept.exists(_._1 == 10L) && !kept.exists(_._1 == 12L),
      s"non-representative members must be dropped: $kept")
    assert(kept.contains((20L, 20L, 1L)) && kept.contains((30L, 30L, 1L)),
      s"singletons keep themselves: $kept")
  }

  test("incrementalNearDup: corpus dup rejects, novel admits, earlier-batch dup blocks fate-independently") {
    import spark.implicits._
    val corpus = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven eight nine ten")
      .toDF("doc_id", "text")
    val batch = Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa extra", // corpus near-dup
      11L -> "totally different words compose this novel document body text",  // novel
      12L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa more",  // dup of corpus 1 AND of batch 10
      13L -> "totally different words compose this novel document body tail")  // dup of EARLIER batch 11 only
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(corpus, batch, "doc_id", "text",
        bands = 4, rowsPerBand = 2, threshold = 0.5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_corpus_dups"), r.getAs[Long]("n_batch_dups"),
          r.getAs[Long]("kept"))))
      .toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L),
      s"one verdict per batch doc, corpus never re-judged: $out")
    assert(out(10L)._1 >= 1L && out(10L)._3 == 0L, s"corpus dup rejected: $out")
    assert(out(11L) == ((0L, 0L, 1L)), s"novel doc admitted: $out")
    // fate-independence: 10 was itself rejected (corpus dup) yet still
    // blocks 12 as an earlier-id batch near-dup
    assert(out(12L)._1 >= 1L && out(12L)._2 >= 1L && out(12L)._3 == 0L, s"$out")
    assert(out(13L)._1 == 0L && out(13L)._2 >= 1L && out(13L)._3 == 0L,
      s"earlier-batch dup rejected without any corpus hit: $out")
  }

  test("incrementalNearDup maxBandDf: hot corpus bands are capped, recall rides the cool bands") {
    import spark.implicits._
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // 30 boilerplate-identical corpus docs: every band of that text is
    // hot (df = 30); one distinctive corpus doc stays under any cap
    val corpus = ((1L to 30L).map(_ -> boiler) :+
      (100L -> "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val batch = Seq(
      200L -> (boiler + " extra"),                                  // dup of the hot cluster
      201L -> "one two three four five six seven eight nine more")  // dup of the cool doc
      .toDF("doc_id", "text")
    def run(cap: Option[Int]) =
      Dedup.incrementalNearDup(corpus, batch, "doc_id", "text",
          bands = 4, rowsPerBand = 2, threshold = 0.5, maxBandDf = cap)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_corpus_dups"), r.getAs[Long]("kept")))).toMap
    val uncapped = run(None)
    assert(uncapped(200L)._1 == 30L && uncapped(200L)._2 == 0L, s"$uncapped")
    val capped = run(Some(10))
    // every band of the boilerplate cluster exceeds the cap → the
    // cluster is deliberately waved through (the documented tradeoff);
    // the cool doc's bands survive, so its dup is still rejected
    assert(capped(200L) == ((0L, 1L)), s"hot-cluster candidates must be capped away: $capped")
    assert(capped(201L)._1 == 1L && capped(201L)._2 == 0L,
      s"cool-band recall must survive the cap: $capped")
  }

  test("persisted near-dup index: admit ≡ live path; append blocks second-generation dups") {
    import spark.implicits._
    val corpus = Seq(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six").toDF("doc_id", "text")
    val batch1 = Seq(
      10L -> "alpha beta gamma delta epsilon zeta extra",  // corpus dup
      11L -> "red green blue cyan magenta yellow",         // novel → admitted
      12L -> "red green blue cyan magenta yellow extra")   // batch dup of 11
      .toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_ndidx").toString
    Dedup.buildNearDupIndex(corpus, work, "doc_id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.5)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_corpus_dups"), r.getAs[Long]("n_batch_dups"),
        r.getAs[Long]("kept"))).toList

    val live = rows(Dedup.incrementalNearDup(corpus, batch1, "doc_id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.5))
    val idx = rows(Dedup.admitWithIndex(spark, work, batch1, "doc_id", "text"))
    assert(idx == live, s"index admission must equal the live path: $idx vs $live")
    assert(idx.map(t => t._1 -> t._4).toMap == Map(10L -> 0L, 11L -> 1L, 12L -> 0L))

    // append ONLY the admitted slice; a second-generation copy of an
    // admitted doc must now reject AS A CORPUS DUP
    Dedup.appendToNearDupIndex(spark, work,
      batch1.filter(col("doc_id") === 11L), "doc_id", "text")
    val batch2 = Seq(
      20L -> "red green blue cyan magenta yellow shiny",   // 2nd-gen of 11
      21L -> "seven eight nine ten eleven twelve")         // novel
      .toDF("doc_id", "text")
    val r2 = rows(Dedup.admitWithIndex(spark, work, batch2, "doc_id", "text"))
    assert(r2 == List((20L, 1L, 0L, 0L), (21L, 0L, 0L, 1L)),
      s"appended docs must gate the next increment: $r2")
    // the append is load-bearing: against the ORIGINAL corpus alone the
    // second-generation doc would have been admitted
    val without = rows(Dedup.incrementalNearDup(corpus, batch2, "doc_id", "text",
      bands = 4, rowsPerBand = 2, threshold = 0.5))
    assert(without.head == ((20L, 0L, 0L, 1L)), s"control: $without")
    // maxBandDf folds base + appended df deltas: cap 0 is rejected,
    // cap 1 keeps every band (no key is shared by 2 indexed docs here)
    val capped = rows(Dedup.admitWithIndex(spark, work, batch2, "doc_id", "text",
      maxBandDf = Some(1)))
    assert(capped == r2, s"an un-hot index must be cap-invariant: $capped")
  }

  test("incrementalNearDup: a batch doc too short to shingle is admitted untouched") {
    import spark.implicits._
    val corpus = Seq(1L -> "alpha beta gamma delta epsilon zeta").toDF("doc_id", "text")
    val batch = Seq(10L -> "a b", 11L -> "").toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(corpus, batch, "doc_id", "text",
        bands = 4, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("kept")).toMap
    assert(out == Map(10L -> 1L, 11L -> 1L), s"$out")
  }

  test("admission index paths fail loudly on non-integral ids (no silent null-cast)") {
    // a string id silently cast to long yields nulls that join to
    // nothing — every dup would look novel; the guard refuses instead
    import spark.implicits._
    val strDocs = Seq("a" -> "alpha beta gamma delta epsilon zeta").toDF("doc_id", "text")
    val longDocs = Seq(1L -> "alpha beta gamma delta epsilon zeta").toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ndidx_guard").toString
    val e1 = intercept[IllegalArgumentException] {
      Dedup.buildNearDupIndex(strDocs, dir, "doc_id", "text", bands = 4, rowsPerBand = 2)
    }
    assert(e1.getMessage.contains("integral id"), e1.getMessage)
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDup(longDocs, strDocs, "doc_id", "text",
        bands = 4, rowsPerBand = 2)
    }
    Dedup.buildNearDupIndex(longDocs, dir, "doc_id", "text", bands = 4, rowsPerBand = 2)
    intercept[IllegalArgumentException] {
      Dedup.appendToNearDupIndex(spark, dir, strDocs, "doc_id", "text")
    }
    // integer ids (not just bigint) remain acceptable — widening is safe
    val intDocs = Seq(7 -> "one two three four five six").toDF("doc_id", "text")
    assert(Dedup.incrementalNearDup(longDocs, intDocs, "doc_id", "text",
      bands = 4, rowsPerBand = 2).collect().length == 1)
  }

  test("snapshotDiff: formatting-only churn is unchanged; real edits, adds, deletes detected") {
    import spark.implicits._
    val v1 = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon zeta"), (4L, "eta theta")
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "  alpha   BETA "), // canonicalizes to v1's fingerprint → unchanged
      (2L, "gamma delta prime"), // real edit → changed
      (4L, "eta theta"), // untouched
      (9L, "iota kappa") // new page
    ).toDF("doc_id", "text") // doc 3 vanished
    val got = Dedup.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "deleted",
      4L -> "unchanged", 9L -> "added"))
  }

  test("snapshotFuzzyDiff: the changed class triages minor_edit vs rewrite by shingle Jaccard") {
    import spark.implicits._
    val ten = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10" // 8 trigram shingles
    val v1 = Seq(
      (1L, ten),                 // formatting churn → unchanged
      (2L, ten),                 // one appended word → minor_edit
      (3L, ten),                 // full reversal → rewrite
      (4L, "a b"),               // too short to shingle, real edit → rewrite
      (5L, ten)                  // deleted
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, s"  $ten   "),
      (2L, s"$ten w11"),         // 8/9 shared → jaccard 8/9 ≥ 0.5
      (3L, ten.split(" ").reverse.mkString(" ")),
      (4L, "a c"),
      (9L, ten)                  // added
    ).toDF("doc_id", "text")
    val got = Dedup.snapshotFuzzyDiff(v1, v2, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "minor_edit", 3L -> "rewrite",
      4L -> "rewrite", 5L -> "deleted", 9L -> "added"), got.toString)
  }

  test("gramCoverage: full / partial / zero coverage, short probes absent") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f g h"),        // grams abcde bcdef cdefg defgh
      (2L, "p q r s t u")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "a b c d e f g h"),       // verbatim copy → coverage 1
      (11L, "a b c d e x y z w"),     // 5 grams, only abcde hits → 1/5
      (12L, "m n o v w x y"),         // nothing shared → 0
      (13L, "a b c")                  // < 5 tokens → no grams, absent
    ).toDF("doc_id", "text")
    val got = Dedup.gramCoverage(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      10L -> ((4L, 4L, 1000000L)),
      11L -> ((5L, 1L, 200000L)),
      12L -> ((3L, 0L, 0L))), got.toString)
    // the corpus gram stream is pruned behind a BROADCAST of the probe
    // gram set — no shuffle keyed by corpus grams anywhere
    val plan = Dedup.gramCoverage(corpus, bench, "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(800))
  }

  test("assembleConversations: suffix truncation, boundary budgets, order-free fp") {
    import spark.implicits._
    // user 1: 4 turns costing 2,3,2,3 pre-tokens (texts are letter runs
    // + digit runs); budget 5 keeps the LAST two (3+2... wait: suffix
    // order) — derive expected by hand below
    val ev = Seq(
      (1L, 1L, "aa bb"),     // 2 pre-tokens
      (1L, 2L, "cc dd ee"),  // 3
      (1L, 3L, "ff 11"),     // 2
      (1L, 4L, "gg hh 22"),  // 3
      (2L, 1L, "a b c d e f g h")  // 8 > budget 5 → nothing kept
    ).toDF("user_id", "event_id", "txt")
    val got = Sampling.assembleConversations(ev, "user_id", "event_id", "txt", 5L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    // user 1 suffix sums: turn4=3, turn3=5, turn2=8 → keeps turns 3,4
    assert(got(1L) == ((4L, 2L, 5L, 3L, 4L)), got(1L).toString)
    assert(got(2L) == ((1L, 0L, 0L, -1L, -1L)), got(2L).toString)
    // fingerprint is a pure function of the kept sequence: shuffled input
    // rows produce the identical fp
    def fps(df: org.apache.spark.sql.DataFrame) =
      Sampling.assembleConversations(df, "user_id", "event_id", "txt", 5L)
        .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(fps(ev) == fps(ev.orderBy(rand(7))))
    // distinct kept sequences get distinct fps
    assert(fps(ev)(1L) != fps(ev)(2L))
  }

  test("templateClusters: same layout different values clusters; exact dups and layout changes don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "order #12: total $5 (qty 2)"),
      (2L, "order #9034: total $71 (qty 6)"),
      (3L, "ORDER #7:   total $80 (qty 1)"), // case/whitespace-noised instance
      (4L, "order #12: total $5 (qty 2)"),   // EXACT dup of 1 — adds n_docs, not n_texts
      (5L, "order [12] total $5 qty 2"),     // different punctuation layout → other skeleton
      (6L, "plain words only here"),
      (7L, "other plain text entirely"),     // same shape class as 6 (w w w w)
      (8L, "three words exactly")            // 3-word shape ≠ 4-word shape
    ).toDF("doc_id", "text")
    val got = Dedup.templateClusters(docs, "doc_id", "text", minSize = 2L)
      .collect().map(r => r.getLong(3) -> ((r.getLong(1), r.getLong(2)))).toMap
    // order-template cluster: docs 1,2,3,4 → 4 docs, 3 distinct texts
    assert(got(1L) == ((4L, 3L)), got.toString)
    // shape-class cluster: docs 6,7 (4 plain words each)
    assert(got(6L) == ((2L, 2L)), got.toString)
    // nothing else qualifies (5 and 8 are singleton skeletons)
    assert(got.size == 2, got.toString)
    // skeleton is deterministic and layout-sensitive
    val s1 = docs.select(Dedup.skeleton(col("text"))).collect().map(_.getString(0))
    assert(s1(0) == "w #9: w $9 (w 9)" && s1(4) == "w [9] w $9 w 9", s1.mkString("|"))
  }

  test("sourceDupCensus: internal copies, cross-shared texts, ppm grid") {
    import spark.implicits._
    // srcA: "x" twice (internal dup) + "y"; srcB: "y" (cross-shared with
    // A) + "z"; canonicalization folds whitespace ("x" ≡ " x  ")
    val docs = Seq(
      ("srcA", "x"), ("srcA", " x  "), ("srcA", "y"),
      ("srcB", "y"), ("srcB", "z")).toDF("source", "text")
    val got = Dedup.sourceDupCensus(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // srcA: 3 docs, 2 distinct, 1 internal dup, 1 cross-shared, 333333 ppm
    assert(got("srcA") == ((3L, 2L, 1L, 1L, 333333L)), got.toString)
    assert(got("srcB") == ((2L, 2L, 0L, 1L, 0L)), got.toString)
  }

  test("char-granular operators index by CODE POINTS: non-BMP text aligns kernel, accounting, and rebuild") {
    import spark.implicits._
    // 𝕏 (U+1D54F) and 😀 (U+1F600) are surrogate PAIRS in UTF-16: under
    // code-unit indexing every position after one is off by one vs Spark
    // length()/DuckDB substr, and a cut can split the pair into lone
    // surrogates. Doc 1 owns the run; doc 2 restates it after a non-BMP
    // prefix, so the cut lands at positions BEYOND the surrogate pair.
    val run = "abc𝕏def😀ghi" // 11 code points, 13 UTF-16 units
    val docs = Seq(
      (1L, run + " tail"),
      (2L, "😀x " + run + " y")).toDF("doc_id", "text")
    val out = Dedup.dedupCharSpans(docs, "doc_id", "text", k = 11)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((16L, 0L, run + " tail")), out(1L).toString)
    // doc 2 normalized = "😀x abc𝕏def😀ghi y" (16 code points); the
    // duplicate windows sit at code-point starts 4 ("abc𝕏def😀ghi" =
    // doc 1's window 1) AND 5 ("bc𝕏def😀ghi " = doc 1's window 2),
    // covering cp 4..15 → survivors "😀x " and "y" fuse; n_chars /
    // n_removed count code points, never UTF-16 units
    assert(out(2L) == ((16L, 12L, "😀x y")), out(2L).toString)
    // no lone surrogates anywhere in the rebuild
    out.values.foreach { case (_, _, s) =>
      s.toCharArray.zipWithIndex.foreach { case (c, i) =>
        if (Character.isHighSurrogate(c))
          assert(i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)),
            s"lone high surrogate in '$s'")
        if (Character.isLowSurrogate(c))
          assert(i > 0 && Character.isHighSurrogate(s.charAt(i - 1)),
            s"lone low surrogate in '$s'")
      }
    }
    // n_chars agrees with Spark's own code-point length()
    val sparkLen = docs.select(col("doc_id"),
      length(concat_ws(" ", split(trim(col("text")), "\\s+"))).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (n, _, _)) => assert(n == sparkLen(id), s"doc $id") }
    // both kernels share the code-point frame
    val a = TextHash.charKgramHashes60("x😀y z", 3)
    val b = TextHash.charKgramHashesRolling("x😀y z", 3)
    assert(a.length == 3 && b.length == 3,
      s"5 code points → 3 windows, got md5=${a.length} rolling=${b.length}")
  }

  test("charContamination == naive substring reference; sub-document fragments flag their source docs") {
    import spark.implicits._
    val k = 6
    val rnd = new scala.util.Random(41)
    val alpha = "abcdef"
    val corpus = (1L to 50L).map { i =>
      val sb = new StringBuilder
      (0 until 30 + rnd.nextInt(60)).foreach { _ =>
        if (rnd.nextInt(7) == 0) sb.append(' ')
        else sb.append(alpha(rnd.nextInt(alpha.length)))
      }
      i -> sb.toString
    }
    def norm(s: String) = s.trim.split("\\s+").mkString(" ") match {
      case "" => ""; case t => t
    }
    // benchmark = a mid-document fragment of every 7th doc (the d31 shape)
    val benchTexts = corpus.collect { case (id, t) if id % 7 == 0 =>
      t.substring(math.min(5, t.length), math.min(35, t.length))
    }
    val benchGrams = benchTexts.map(norm).flatMap { t =>
      if (t.length < k) Seq.empty else (0 to t.length - k).map(i => t.substring(i, i + k))
    }.toSet
    val expected = corpus.map { case (id, t0) =>
      val t = norm(t0)
      val wins = math.max(0, t.length - k + 1)
      val hits = (0 until wins).count(i => benchGrams(t.substring(i, i + k)))
      id -> ((wins.toLong, hits.toLong, hits > 0))
    }.toMap
    val bench = benchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("bid", "text")
    val got = Dedup.charContamination(
      corpus.toDF("doc_id", "text"), bench, "doc_id", "text", k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == expected,
      s"mismatches: ${got.keySet.filter(i => got(i) != expected(i)).toSeq.sorted
        .map(i => s"$i: got ${got(i)} want ${expected(i)}").mkString("; ")}")
    // the fixture must discriminate: some contaminated, some clean
    assert(expected.values.exists(_._3) && expected.values.exists(!_._3),
      "fixture must contain both contaminated and clean docs")
  }

  test("charContaminationCensus == naive per-item reference; unleaked items report zeros") {
    import spark.implicits._
    val k = 6
    val rnd = new scala.util.Random(43)
    val alpha = "abcdef"
    val corpus = (1L to 60L).map { i =>
      val sb = new StringBuilder
      (0 until 30 + rnd.nextInt(60)).foreach { _ =>
        if (rnd.nextInt(7) == 0) sb.append(' ')
        else sb.append(alpha(rnd.nextInt(alpha.length)))
      }
      i -> sb.toString
    }
    def norm(s: String) = s.trim.split("\\s+").mkString(" ") match {
      case "" => ""; case t => t
    }
    // benchmark = mid-document fragments keeping their source doc id,
    // plus one item made of a glyph the corpus alphabet cannot contain
    // — it must still appear in the census, with zeros
    val benchItems = corpus.collect { case (id, t) if id % 7 == 0 =>
      id -> t.substring(math.min(5, t.length), math.min(35, t.length))
    } :+ (999L -> "zzzzzz zzzzzz")
    val benchGramsById = benchItems.map { case (bid, t0) =>
      val t = norm(t0)
      bid -> (if (t.length < k) Set.empty[String]
              else (0 to t.length - k).map(i => t.substring(i, i + k)).toSet)
    }.toMap
    // naive reference: per (doc, item) count of the doc's windows whose
    // literal k-substring is in the item's gram set, then the census
    val pairs = for {
      (id, t0) <- corpus
      t = norm(t0)
      (bid, gs) <- benchGramsById
      c = (0 until math.max(0, t.length - k + 1))
            .count(i => gs(t.substring(i, i + k)))
      if c > 0
    } yield (bid, id, c.toLong)
    val expected = benchItems.map(_._1).distinct.sorted.map { bid =>
      val mine = pairs.filter(_._1 == bid).map(_._3)
      bid -> ((mine.size.toLong,
        mine.sum, if (mine.isEmpty) 0L else mine.max))
    }.toMap
    val got = Dedup.charContaminationCensus(
      corpus.toDF("doc_id", "text"), benchItems.toDF("bench_id", "text"),
      "doc_id", "bench_id", "text", k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected,
      s"mismatches: ${got.keySet.filter(i => got(i) != expected(i)).toSeq.sorted
        .map(i => s"$i: got ${got(i)} want ${expected(i)}").mkString("; ")}")
    // the fixture must discriminate: a leaked item, a zero item, and a
    // source doc that flags on its own fragment
    assert(expected(999L) == ((0L, 0L, 0L)), "sentinel item must be unleaked")
    assert(expected.exists { case (bid, (n, _, _)) => bid != 999L && n > 0 },
      "fixture must contain a leaked item")
    val sourcePairs = pairs.filter { case (bid, id, _) => bid == id }
    assert(sourcePairs.nonEmpty, "a fragment's source doc must count as contamination")
  }

  test("charDecontaminateSpans == naive cover-mask reference; clean docs pass through untouched") {
    import spark.implicits._
    val k = 6
    val rnd = new scala.util.Random(47)
    val alpha = "abcdef"
    val corpus = (1L to 50L).map { i =>
      val sb = new StringBuilder
      (0 until 30 + rnd.nextInt(60)).foreach { _ =>
        if (rnd.nextInt(7) == 0) sb.append(' ')
        else sb.append(alpha(rnd.nextInt(alpha.length)))
      }
      i -> sb.toString
    }
    def norm(s: String) = s.trim.split("\\s+").mkString(" ") match {
      case "" => ""; case t => t
    }
    val benchTexts = corpus.collect { case (id, t) if id % 7 == 0 =>
      t.substring(math.min(5, t.length), math.min(35, t.length))
    }
    val benchGrams = benchTexts.map(norm).flatMap { t =>
      if (t.length < k) Seq.empty else (0 to t.length - k).map(i => t.substring(i, i + k))
    }.toSet
    // naive reference: cover mask over benchmark-shared windows, rebuild
    val expected = corpus.map { case (id, t0) =>
      val t = norm(t0)
      val covered = new Array[Boolean](t.length)
      (0 until math.max(0, t.length - k + 1)).foreach { i =>
        if (benchGrams(t.substring(i, i + k)))
          (i until math.min(t.length, i + k)).foreach(covered(_) = true)
      }
      val clean = t.zipWithIndex.collect { case (c, i) if !covered(i) => c }.mkString
      id -> ((t.length.toLong, covered.count(identity).toLong, clean))
    }.toMap
    val bench = benchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("bid", "text")
    val got = Dedup.charDecontaminateSpans(
      corpus.toDF("doc_id", "text"), bench, "doc_id", "text", k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected,
      s"mismatches: ${got.keySet.filter(i => got(i) != expected(i)).toSeq.sorted
        .map(i => s"$i: got ${got(i)} want ${expected(i)}").mkString("; ")}")
    // fixture discriminates: some docs cut, some untouched — and the
    // untouched ones keep their normalized text verbatim
    assert(expected.values.exists(_._2 > 0) && expected.values.exists(_._2 == 0),
      "fixture must contain both cut and clean docs")
    expected.collect { case (id, (n, 0L, clean)) =>
      assert(clean.length.toLong == n, s"clean doc $id must pass through whole")
    }
  }

  test("charBenchGrams fails BY NAME when the benchmark side exceeds the gram bound") {
    import spark.implicits._
    val bench = Seq((1L, "abcdefghijklmnop")).toDF("bid", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.charBenchGrams(bench, "text", k = 3, maxGrams = 5)
    }
    assert(e.getMessage.contains("charBenchGrams"), e.getMessage)
    // at/under the bound: builds fine (14 distinct 3-grams of 16 chars)
    val bc = Dedup.charBenchGrams(bench, "text", k = 3, maxGrams = 14)
    assert(bc.value.length == 14)
    bc.destroy()
  }

  test("dedupCharSpans rolling ≡ md5 at fixture scale (sf0.01 successor-concat corpus)") {
    // the petabyte-path kernel exercised at the driver-gate's own data
    // scale, not just on random micro-corpora: full-frame equality of
    // the d30 query shape under both kernels
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val succ = d.select((col("doc_id") - 1).as("doc_id"), col("text").as("next_text"))
    val synth = d.join(succ, Seq("doc_id"))
      .select(col("doc_id"), concat_ws(" ", col("text"), col("next_text")).as("text"))
    val md5 = Dedup.dedupCharSpans(synth, "doc_id", "text", k = 25, rollingHash = false)
    val roll = Dedup.dedupCharSpans(synth, "doc_id", "text", k = 25, rollingHash = true)
    assert(md5.except(roll).isEmpty && roll.except(md5).isEmpty,
      "rolling and md5 kernels must produce identical frames at fixture scale")
    assert(md5.filter(col("n_removed") > 0).count() > 0,
      "the fixture corpus must actually exercise the cut")
  }
}
