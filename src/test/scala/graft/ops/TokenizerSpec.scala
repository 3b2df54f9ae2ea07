package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The tokenizer seam: both shipped tokenizers count deterministically,
  * and the budget/packing operators are tokenizer-agnostic — the unit
  * swaps, the operator logic doesn't. */
class TokenizerSpec extends SparkSpec {

  test("whitespace vs regex-BPE counts on known strings") {
    import spark.implicits._
    val rows = Seq(
      // ws: 4 tokens; bpe: don|'t|stop|me|now → 5
      ("don't stop me now", 4L, 5L),
      // ws: "hello," "world!!" → 2; bpe: hello | , | world | !! → 4
      ("hello, world!!", 2L, 4L),
      // digits split from letters: abc123 → abc|123
      ("abc123 x9", 2L, 4L),
      ("", 0L, 0L),
      ("   ", 0L, 0L))
    val df = rows.map(_._1).toDF("text")
    val got = df.select(
        WhitespaceTokenizer.count(col("text")).as("ws"),
        RegexBpeTokenizer.count(col("text")).as("bpe"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == rows.map(r => (r._2, r._3)),
      s"got ${got.toSeq} want ${rows.map(r => (r._2, r._3))}")
  }

  test("packSequences under both tokenizers: same docs, re-denominated tape") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "it's a test, really!"),
      (3L, "")).toDF("doc_id", "text")
    def pack(tk: Tokenizer) = Sampling.packSequences(
        docs.select(col("doc_id"), tk.count(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", seqLen = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ws = pack(WhitespaceTokenizer)
    val bpe = pack(RegexBpeTokenizer)
    // doc 3 has no tokens under either unit and occupies no tape
    assert(!ws.contains(3L) && !bpe.contains(3L))
    assert(ws(1L) == 4L && bpe(1L) == 4L, "pure words count identically")
    // "it's a test, really!" → ws 4; bpe: it|'s|a|test|,|really|! → 7
    assert(ws(2L) == 4L && bpe(2L) == 7L, s"ws=$ws bpe=$bpe")
  }

  /** Independent reference BPE — deliberately a DIFFERENT implementation
    * shape from [[graft.expr.BpeEncoder]] (immutable lists, pair-scan
    * via zip, recursion) so the two can only agree by computing the
    * same function. The oracle literals in p22/p23 come from here. */
  private def refBpe(word: String, merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    @annotation.tailrec
    def loop(sym: List[String]): List[String] = {
      val present = sym.zip(sym.drop(1)).flatMap(rank.get)
      if (present.isEmpty) sym
      else {
        val (a, b) = merges(present.min)
        def fuse(xs: List[String]): List[String] = xs match {
          case `a` :: `b` :: rest => (a + b) :: fuse(rest)
          case x :: rest          => x :: fuse(rest)
          case Nil                => Nil
        }
        loop(fuse(sym))
      }
    }
    loop(word.map(String.valueOf(_)).toList)
  }

  test("merges-table BPE: fixture-vocab encodings match an independent reference, incl. the oracle literals") {
    import spark.implicits._
    val m = MergesBpeTokenizer.fixtureMerges
    // the p22/p23 oracle constants: segment → subword count
    val expectedSegs = Map(
      "AUTOMOBILE" -> 8, "BUILDING" -> 3, "FURNITURE" -> 7,
      "MACHINERY" -> 7, "HOUSEHOLD" -> 6)
    expectedSegs.foreach { case (w, n) =>
      assert(refBpe(w, m).length == n, s"reference disagrees on $w")
      assert(MergesBpeTokenizer.fixture.encoder.encodedLength(w) == n,
        s"encoder disagrees on $w: ${refBpe(w, m)}")
    }
    // multi-level merge really fused: BUILDING → BUI|LD|ING
    assert(refBpe("BUILDING", m) == List("BUI", "LD", "ING"))
    // rank precedence: IN (rank 0) fuses before ER (rank 2) in MACHINERY
    assert(refBpe("MACHINERY", m) == List("M", "A", "C", "H", "IN", "ER", "Y"))
    // randomized cross-validation over the fixture alphabet
    val rnd = new scala.util.Random(13)
    val alpha = "AUBILDNGOMHERTY"
    (1 to 200).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(MergesBpeTokenizer.fixture.encoder.encodedLength(w) == refBpe(w, m).length,
        s"divergence on $w: ref=${refBpe(w, m)}")
    }
    // the column function: pre-tokens split first, digits carry no
    // merges, whitespace counts nothing; NULL → 0 through the operators
    val df = Seq(
      ("BUILDING 1234", 3L + 4L),
      ("HOUSEHOLD 7", 6L + 1L),
      ("", 0L)).toDF("text", "want")
    val got = df.select(MergesBpeTokenizer.fixture.count(col("text")).as("n"), col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"${r}"))
    // an empty merges table degenerates to per-character counting of the
    // same pre-token stream
    val noMerges = new MergesBpeTokenizer(Seq.empty)
    assert(Seq("ab cd!").toDF("text")
      .select(noMerges.count(col("text"))).head.getLong(0) == 5L)
  }

  test("BPE trainer: learned merges match a hand-computed trace, incl. consecutive fusions") {
    import spark.implicits._
    // dict: "aaab"×3, "abab"×2, "cd"×5
    // round 1 pairs: (a,a): 3·2=6  (a,b): 3·1+2·2=7  (b,a): 2  (c,d): 5
    //   → best (a,b) 7; merge: aaab→[a,a,ab] (consecutive fusion in abab→[ab,ab])
    // round 2: (a,a): 3  (a,ab): 3  (ab,ab): 2  (c,d): 5 → best (c,d) 5
    // round 3: (a,a) vs (a,ab) tie at 3 → pair-asc tie-break: (a,a)
    val docs = Seq(
      "aaab aaab aaab abab abab cd cd cd cd cd").toDF("text")
    val got = BpeTrainer.trainMerges(BpeTrainer.wordDict(docs, "text"), rounds = 3)
    assert(got == Seq(
      BpeTrainer.LearnedMerge(1, "a", "b", 7L),
      BpeTrainer.LearnedMerge(2, "c", "d", 5L),
      BpeTrainer.LearnedMerge(3, "a", "a", 3L)), got.toString)
  }

  test("BPE trainer: deterministic across reruns on the fixture corpus") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val m1 = BpeTrainer.trainMerges(BpeTrainer.wordDict(d, "text"), rounds = 4)
    val m2 = BpeTrainer.trainMerges(BpeTrainer.wordDict(d, "text"), rounds = 4)
    assert(m1 == m2)
    assert(m1.length == 4)
    // frequencies are non-increasing only per-pair-generation, but every
    // learned pair must have been the round's strict argmax under the
    // (freq desc, pair asc) order — check ranks are 1..4 and pairs unique
    assert(m1.map(m => (m.x, m.y)).distinct.length == 4)
    assert(m1.map(_.r) == Seq(1, 2, 3, 4))
  }

  test("tokenBudget under the merges-BPE unit: operator unchanged, unit swapped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "BUILDING BUILDING", 0.9),   // 6 subword tokens
      (2L, "AUTOMOBILE", 0.8),          // 8
      (3L, "HOUSEHOLD", 0.7)).toDF("doc_id", "text", "q")
    val counted = docs.select(col("doc_id"), col("q"),
      MergesBpeTokenizer.fixture.count(col("text")).as("n_tokens"))
    val kept = Sampling.tokenBudget(counted, "doc_id", "q", "n_tokens", budget = 14L)
      .collect().map(_.getLong(0)).toSet
    // greedy best-quality prefix: doc1 (6) + doc2 (8) = 14 fits; doc3 would overflow
    assert(kept == Set(1L, 2L), s"got $kept")
  }
}
