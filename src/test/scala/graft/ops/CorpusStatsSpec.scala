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
}
