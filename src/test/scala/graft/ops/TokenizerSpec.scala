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
}
