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
}
