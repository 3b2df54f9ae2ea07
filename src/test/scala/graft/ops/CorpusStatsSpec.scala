package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CorpusStats operators vs brute-force Scala recomputation on a tiny
  * hand-checkable corpus. */
class CorpusStatsSpec extends SparkSpec {

  private val corpus = Seq(
    (1L, "a b a b c"),
    (2L, "a b c d"),
    (3L, "d d d d"),
    (4L, "z"), // single token: no bigrams, must drop out of LM scoring
    (5L, "a b a b c")) // exact copy of doc 1: identical scores

  private def df = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  test("bigramLmScore == brute-force corpus bigram LM") {
    // brute force in plain Scala
    val docToks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val allBigrams = docToks.flatMap { case (id, tk) =>
      tk.sliding(2).filter(_.size == 2).map(p => (id, (p(0), p(1))))
    }
    val cBg = allBigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val cUg = allBigrams.groupBy(_._2._1).view.mapValues(_.size).toMap
    // the operator contract: each log-prob quantized to the 1e-6 grid,
    // summed exactly, one final division (order-free across engines)
    val expected = allBigrams.groupBy(_._1).view.mapValues { bgs =>
      val q = bgs.map { case (_, bg) =>
        math.round(math.log(cBg(bg).toDouble / cUg(bg._1)) * 1e6)
      }
      (bgs.size.toLong, q.sum.toDouble / (q.size * 1e6))
    }.toMap

    val got = CorpusStats.bigramLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(got.keySet == expected.keySet, "single-token doc must be absent")
    for ((id, (n, lp)) <- expected) {
      assert(got(id)._1 == n, s"doc $id n_bigrams")
      assert(math.abs(got(id)._2 - lp) < 1e-12, s"doc $id avg_logp: ${got(id)._2} vs $lp")
    }
    // identical docs score identically; the all-same-token doc is the most
    // predictable (its only transition is d→d with c_bg == c_ug ⇒ logp 0)
    assert(got(1L) == got(5L))
    assert(got(3L)._2 > got(2L)._2, "degenerate repeated-token doc out-scores token soup")
  }

  test("trigramLmScore == brute-force interpolated trigram LM") {
    val docToks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val allTg = docToks.flatMap { case (id, tk) =>
      tk.sliding(3).filter(_.size == 3).map(p => (id, (p(0), p(1), p(2))))
    }
    val cTg = allTg.groupBy(_._2).view.mapValues(_.size).toMap
    val cTgp = allTg.groupBy(t => (t._2._1, t._2._2)).view.mapValues(_.size).toMap
    val cBg = allTg.groupBy(t => (t._2._2, t._2._3)).view.mapValues(_.size).toMap
    val cBgp = allTg.groupBy(_._2._2).view.mapValues(_.size).toMap
    val cUg = allTg.groupBy(_._2._3).view.mapValues(_.size).toMap
    val cAll = allTg.size
    val expected = allTg.groupBy(_._1).view.mapValues { tgs =>
      val q = tgs.map { case (_, tg) =>
        val p = 0.6 * (cTg(tg).toDouble / cTgp((tg._1, tg._2))) +
          0.3 * (cBg((tg._2, tg._3)).toDouble / cBgp(tg._2)) +
          0.1 * (cUg(tg._3).toDouble / cAll)
        math.round(math.log(p) * 1e6)
      }
      (tgs.size.toLong, q.sum.toDouble / (q.size * 1e6))
    }.toMap

    val got = CorpusStats.trigramLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet, "sub-3-token docs must be absent")
    for ((id, (n, lp)) <- expected) {
      assert(got(id)._1 == n, s"doc $id n_trigrams")
      assert(math.abs(got(id)._2 - lp) < 1e-12, s"doc $id avg_logp: ${got(id)._2} vs $lp")
    }
    assert(got(1L) == got(5L), "identical docs score identically")
    assert(got(3L)._2 > got(2L)._2,
      "the maximally-predictable repeated-token doc out-scores one-off trigrams")
  }

  test("tfidfTopTerms == brute-force tf-idf ranking") {
    val docToks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = docToks.size
    val tf = docToks.flatMap { case (id, tk) => tk.map(w => (id, w)) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val dfc = tf.keys.toSeq.map(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val expected = tf.keys.groupBy(_._1).flatMap { case (id, keys) =>
      keys.toSeq
        .map { case (_, w) =>
          val sq = math.round(tf((id, w)) * math.log(n.toDouble / dfc(w)) * 1e6)
          (w, sq)
        }
        .sortBy { case (w, sq) => (-sq, w) }
        .take(2).zipWithIndex
        .map { case ((w, _), i) => (id, w, i + 1L) }
    }.toSet

    val got = CorpusStats.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .select("doc_id", "term", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("nbQualityScore == brute-force multinomial Naive Bayes") {
    import spark.implicits._
    // pos seed = docs 1,5 ("a b" heavy); neg seed = doc 3 ("d" soup);
    // docs 2 and 4 are scored but unlabeled; doc 2 carries the OOV-in-
    // one-class token d, doc 6 an everywhere-OOV token
    val docs6 = corpus :+ (6L, "qq zz")
    val d6 = docs6.toDF("doc_id", "text")
    val seedPairs = Seq((1L, true), (5L, true), (3L, false))
    val seed = seedPairs.toDF("doc_id", "lab")

    // brute force: Laplace-smoothed class likelihoods over seed tokens,
    // each quantized to the 1e-6 grid, exact integer sum + prior
    val toks = docs6.toMap.view.mapValues(_.split("\\s+").toSeq).toMap
    val posDocs = seedPairs.filter(_._2).map(_._1)
    val negDocs = seedPairs.filterNot(_._2).map(_._1)
    val cPos = posDocs.flatMap(toks).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cNeg = negDocs.flatMap(toks).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = (cPos.keySet ++ cNeg.keySet)
    val (tPos, tNeg, v) = (cPos.values.sum, cNeg.values.sum, vocab.size.toLong)
    def q(x: Double) = math.round(math.log(x) * 1e6)
    def lp(c: Map[String, Long], t: Long)(w: String) =
      if (vocab(w) || c.contains(w)) q((c.getOrElse(w, 0L) + 1).toDouble / (t + v))
      else q(1.0 / (t + v))
    val prior = q(posDocs.size.toDouble / negDocs.size)
    val expected = toks.view.mapValues { tk =>
      (tk.size.toLong,
        prior + tk.map(w => lp(cPos, tPos)(w) - lp(cNeg, tNeg)(w)).sum)
    }.toMap

    val got = CorpusStats.nbQualityScore(d6, "doc_id", "text", seed)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet == expected.keySet)
    for ((id, (n, s)) <- expected) {
      assert(got(id)._1 == n, s"doc $id n_tokens")
      assert(got(id)._2 == s, s"doc $id score_q: ${got(id)._2} vs $s")
      assert(got(id)._3 == (s > 0), s"doc $id pred")
    }
    // the classifier must actually separate the seed styles: a positive
    // seed doc scores positive, the negative seed doc negative, and the
    // identical copy of doc 1 scores identically
    assert(got(1L)._3 && !got(3L)._3)
    assert(got(1L) == got(5L))
  }

  // shared brute-force pieces for the DSIR tests ---------------------------

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 15), 16)
  }

  /** hashed unigram+bigram bucket sequence of a text, mirroring dsirTf */
  private def dsirFeats(t: String, b: Int): Seq[Long] = {
    val tk = t.split("\\s+").toSeq
    (tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
      .map(f => h60(f) % b)
  }

  test("dsirScore == brute-force hashed-ngram importance weights") {
    val B = 64
    val d = df
    val (model, consts) = CorpusStats.dsirTrain(
      d.filter(col("doc_id").isin(1L, 5L)), d.filter(col("doc_id").isin(2L, 3L)),
      "doc_id", "text", buckets = B)
    val got = CorpusStats.dsirScore(d, "doc_id", "text", model, consts, buckets = B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // brute force: Laplace smoothing over the FIXED B-bucket space means a
    // bucket unseen in a seed contributes exactly the "unseen" constant —
    // no seen-set special case, unlike NB's data-dependent vocabulary
    val corpusMap = corpus.toMap
    val ct = Seq(1L, 5L).flatMap(id => dsirFeats(corpusMap(id), B))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = Seq(2L, 3L).flatMap(id => dsirFeats(corpusMap(id), B))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    def q(x: Double) = math.round(math.log(x) * 1e6)
    def lt(b: Long) = q((ct.getOrElse(b, 0L) + 1).toDouble / (tt + B))
    def lr(b: Long) = q((cr.getOrElse(b, 0L) + 1).toDouble / (tr + B))
    val expected = corpus.map { case (id, t) =>
      val fs = dsirFeats(t, B)
      id -> (fs.size.toLong, fs.map(b => lt(b) - lr(b)).sum)
    }.toMap
    assert(got == expected)
    // identical docs weigh identically; a target-seed doc out-weighs a
    // raw-seed doc
    assert(got(1L) == got(5L))
    assert(got(1L)._2 > got(3L)._2)
  }

  test("dsirResample: deterministic Gumbel-top-k == brute-force ranking") {
    val B = 64
    val d = df
    val (model, consts) = CorpusStats.dsirTrain(
      d.filter(col("doc_id").isin(1L, 5L)), d.filter(col("doc_id").isin(2L, 3L)),
      "doc_id", "text", buckets = B)
    val scored = CorpusStats.dsirScore(d, "doc_id", "text", model, consts, buckets = B)
    val logw = scored.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    val M = 1L << 20
    def keyOf(id: Long): Long = {
      val u = (h60(s"dsir|$id") % M + 0.5) / M
      logw(id) + math.round(-math.log(-math.log(u)) * 1e6)
    }
    val expected = logw.keys.toSeq
      .sortBy(id => (-keyOf(id), id)).take(3)
      .zipWithIndex.map { case (id, i) => (id, keyOf(id), i + 1L) }.toSet

    val got = CorpusStats.dsirResample(scored, "doc_id", "logw_q", k = 3)
      .select("doc_id", "key_q", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)

    // k beyond the corpus returns everything, still ranked
    val all = CorpusStats.dsirResample(scored, "doc_id", "logw_q", k = 100)
    assert(all.count() == logw.size)
    // rerun is bit-identical (no RNG state anywhere)
    val again = CorpusStats.dsirResample(scored, "doc_id", "logw_q", k = 3)
      .select("doc_id", "key_q", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got)
  }

  test("groupedZScores == stddev_pop z-scores; zero-variance and singleton groups score 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "aaaa"), (2L, "en", "aaaaaaaa"), (3L, "en", "aaaaaaaaaaaa"),
      (4L, "de", "bbbbbb"), (5L, "de", "bbbbbb"),   // zero variance
      (6L, "fr", "c")                                // singleton
    ).toDF("doc_id", "lang", "text")
    val got = CorpusStats.groupedZScores(docs, "doc_id", "lang",
        length(col("text")))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // en: lengths 4/8/12, mu=8, sigma_pop=sqrt(32/3)
    val sig = math.sqrt(32.0 / 3.0)
    assert(math.abs(got(1L) - (-4.0 / sig)) < 1e-12, got(1L).toString)
    assert(math.abs(got(2L)) < 1e-12)
    assert(math.abs(got(3L) - 4.0 / sig) < 1e-12)
    assert(got(4L) == 0.0 && got(5L) == 0.0, "zero-variance group scores 0")
    assert(got(6L) == 0.0, "singleton scores 0")
    // no window operator anywhere in the plan
    val plan = CorpusStats.groupedZScores(docs, "doc_id", "lang", length(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(600))
  }

  test("psiDrift: zero on identical snapshots, exact formula on a drifted one") {
    import spark.implicits._
    val ref = Seq(0L, 0L, 1L, 1L, 1L, 2L).toDF("bin")
    // identical distributions → every term is exactly 0 (pc == pr)
    val same = CorpusStats.psiDrift(ref, ref, "bin").collect()
    assert(same.forall(_.getLong(3) == 0L), same.mkString(","))
    // drifted + a bin absent from each side: finite terms, driver replay
    val cur = Seq(1L, 2L, 2L, 2L, 3L).toDF("bin")
    val got = CorpusStats.psiDrift(ref, cur, "bin")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val refN = Map(0L -> 2L, 1L -> 3L, 2L -> 1L, 3L -> 0L)
    val curN = Map(0L -> 0L, 1L -> 1L, 2L -> 3L, 3L -> 1L)
    val (tr, tc, nb) = (6.0, 5.0, 4.0)
    refN.keys.foreach { b =>
      val pr = (refN(b) + 1) / (tr + nb); val pc = (curN(b) + 1) / (tc + nb)
      val exp = math.round((pc - pr) * math.log(pc / pr) * 1e6)
      assert(got(b) == (refN(b), curN(b), exp), s"bin $b: ${got(b)} vs $exp")
    }
    // total PSI over a real drift is positive (the alarm direction)
    assert(refN.keys.toSeq.map(b => got(b)._3).sum > 0L)
  }

  test("tokenizerFertility: exact sums and quantized ratios on known docs") {
    import spark.implicits._
    val docs = Seq(
      ("en", "ab cd!"),      // 2 words; pre-tokens ab|cd|! = 3; 6 chars
      ("en", "it's 42"),     // 2 words; it|'s|42 = 3; 7 chars
      ("de", ""),            // 0 words, 0 pre-tokens, 0 chars
      ("de", "xyz")          // 1 word, 1 pre-token, 3 chars
    ).toDF("lang", "text")
    val got = CorpusStats.tokenizerFertility(docs, "lang", "text",
        RegexBpeTokenizer.count(col("text")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.get(5), r.get(6))).toMap
    assert(got("en") == ((2L, 13L, 4L, 6L,
      math.round(6L * 1e6 / 4L), math.round(13L * 1e6 / 6L))), got("en").toString)
    assert(got("de") == ((2L, 3L, 1L, 1L, 1000000L, 3000000L)), got("de").toString)
  }

  test("effectiveTokens: mirrors down-weight by global cluster size; unique docs keep full weight") {
    import spark.implicits._
    val docs = Seq(
      ("A", "one two three four five"),  // fp X, 5 tokens
      ("A", "solo text here"),           // unique, 3 tokens
      ("B", "  one two   three four five "), // fp X (whitespace-noised copy)
      ("C", "one two three four five"),  // fp X
      ("C", "one two three four five")   // fp X again (2 in C) → cluster size 4
    ).toDF("source", "text")
    val got = CorpusStats.effectiveTokens(docs, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // cluster X spans A(1), B(1), C(2): size 4 → per-copy weight 1/4
    assert(got("A") == ((2L, 8L, (5L * 1000000L) / 4 + 3L * 1000000L)), got.toString)
    assert(got("B") == ((1L, 5L, (5L * 1000000L) / 4)), got.toString)
    // C's floor is taken on its (fp, source) token SUM (10 tokens)
    assert(got("C") == ((2L, 10L, (10L * 1000000L) / 4)), got.toString)
    // total effective ≈ deduped corpus: X counted once (5) + solo (3)
    val eff = got.values.map(_._3).sum
    assert(eff == 8L * 1000000L, eff.toString)
  }

  test("vocabCoverage: top-V occupancy per group, occurrence-weighted, deterministic boundary") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the the the cat"),   // 'the' dominates the global count
      ("en", "the dog"),
      ("de", "der der hund"),
      ("de", "xyzzy qwerty plugh") // rare words → uncovered at V=2
    ).toDF("lang", "text")
    // global counts: the=4, der=2, then singletons — V=2 keeps {the, der}
    val got = CorpusStats.vocabCoverage(docs, "lang", "text", v = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("en") == ((6L, 4L, math.round(4L * 1e6 / 6L))), got.toString)
    assert(got("de") == ((6L, 2L, math.round(2L * 1e6 / 6L))), got.toString)
    // a huge V covers everything
    val full = CorpusStats.vocabCoverage(docs, "lang", "text", v = 1000)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(full.values.forall(_ == 1000000L), full.toString)
  }

  test("textRankTerms: the co-occurrence hub outranks peripheral terms; deterministic") {
    import spark.implicits._
    // 'hub' neighbors every other frequent word; satellites only see hub
    val docs = Seq(
      (1L, "hub aa hub bb hub cc"),
      (2L, "hub aa hub bb hub cc"),
      (3L, "hub aa hub bb hub cc"),
      (4L, "rare singleton words appear once only")
    ).toDF("doc_id", "text")
    val got = CorpusStats.textRankTerms(docs, "doc_id", "text", minCount = 3L, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.head._1 == "hub", got.mkString(","))
    assert(got.forall(_._1 != "singleton"), "below-minCount words must be pruned")
    // graph mass: Σ pr over kept vertices ≈ SCALE (truncation only)
    val total = got.map(_._2).sum
    assert(total <= 1000000000000L && total > 999999990000L, total.toString)
    val again = CorpusStats.textRankTerms(docs.repartition(5), "doc_id", "text", 3L, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(again.toSeq == got.toSeq, "TextRank must be partition-order-free")
  }

  test("calibrationCurve: fixed bands, clamping, exact ppm rates") {
    import spark.implicits._
    // bands of 200000 over [-1000000, 999999]: bin = (clamp+1e6) div 2e5
    val scored = Seq(
      (1L, -5000000L), // clamps to lo → bin 0
      (2L, -100001L),  // bin 4
      (3L, 0L),        // bin 5
      (4L, 100000L),   // bin 5
      (5L, 350000L),   // bin 6
      (6L, 9999999L)   // clamps to hi → bin 9
    ).toDF("doc_id", "score_q")
    val labels = Seq((1L, false), (2L, false), (3L, true), (4L, false),
      (5L, true), (6L, true)).toDF("doc_id", "lab")
    val got = CorpusStats.calibrationCurve(scored, "score_q", labels)
      .orderBy(col("bin")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((1L, 0L, 0L)) && got(4L) == ((1L, 0L, 0L)), got.toString)
    assert(got(5L) == ((2L, 1L, 500000L)), "bin 5: one of two gold → 500000 ppm")
    assert(got(6L) == ((1L, 1L, 1000000L)) && got(9L) == ((1L, 1L, 1000000L)), got.toString)
    // only labeled docs participate
    val half = CorpusStats.calibrationCurve(scored, "score_q",
      labels.filter(col("doc_id") <= 3L))
    assert(half.agg(org.apache.spark.sql.functions.sum("n_docs")).head.getLong(0) == 3L)
  }

  test("excessLossWeights: worse-modeled source upweighted; weights sum to exactly 1e6") {
    import spark.implicits._
    // srcA repeats one bigram (well modeled); srcB's bigrams are diluted
    // by srcA's mass sharing the 'the' prefix → higher loss → more weight
    val docs = Seq(
      ("srcA", "the cat the cat the cat"), ("srcA", "the cat the cat"),
      ("srcB", "the dog runs far"), ("srcB", "the dog runs")
    ).toDF("source", "text")
    val got = CorpusStats.excessLossWeights(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("srcB")._4 > got("srcA")._4, got.toString)
    assert(got.values.map(_._4).sum == 1000000L, "weights must sum to exactly 1e6 ppm")
    // identical sources → zero excess everywhere → uniform split
    val same = Seq(("s1", "a b c"), ("s2", "a b c")).toDF("source", "text")
    val uni = CorpusStats.excessLossWeights(same, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(uni.values.toSeq.sorted == Seq(500000L, 500000L), uni.toString)
  }

  test("qualityFrontier: suffix-cumulative bands, shares sum correctly") {
    import spark.implicits._
    // q_q: 'a b' short text → lengthOk 0, band depends on ratios; rather
    // than re-derive scores, assert the STRUCTURAL frontier invariants
    val docs = Seq("the quick brown fox jumps over the lazy dog and runs on",
      "zz", "the the the and and of", "x1 9 $%").toDF("text")
    val rows = CorpusStats.qualityFrontier(docs, "text")
      .orderBy(col("threshold_q")).collect()
    // lowest observed threshold keeps everything
    assert(rows.head.getLong(1) == 4L, rows.mkString("|"))
    assert(rows.head.getLong(3) == 1000000L, "lowest band keeps 100% of tokens")
    // monotone: higher threshold never keeps more
    val kept = rows.map(_.getLong(1))
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b }, kept.toSeq.toString)
    val share = rows.map(_.getLong(3))
    assert(share.zip(share.tail).forall { case (a, b) => a >= b }, share.toSeq.toString)
  }

  test("missingMass: singleton share per source, empty texts excluded") {
    import spark.implicits._
    // srcA: a a b → N=3, types 2, singletons 1 (b) → 333333 ppm
    // srcB: x y → N=2, 2 singletons → 1_000_000 ppm
    val docs = Seq(("srcA", "a a"), ("srcA", "b"), ("srcB", "x y"),
      ("srcB", "   ")).toDF("source", "text")
    val got = CorpusStats.missingMass(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("srcA") == ((3L, 2L, 1L, 333333L)), got.toString)
    assert(got("srcB") == ((2L, 2L, 2L, 1000000L)), got.toString)
  }
}
