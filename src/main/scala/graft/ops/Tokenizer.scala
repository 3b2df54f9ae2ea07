package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Token-accounting seam (the [[Multimodal.MediaDecoder]] pattern, for
  * text): the budget/packing operators ([[Sampling.tokenBudget]],
  * [[Sampling.packSequences]]) take a pre-counted token column, so the
  * tokenizer is a pluggable COLUMN FUNCTION applied where documents are
  * counted — swapping it never touches an operator. Two engine-portable
  * implementations ship; a real deployment plugs a true subword
  * tokenizer (merges-table BPE, SentencePiece) through the same trait —
  * e.g. a broadcast vocab inside a custom expression — and every
  * budget/packing query re-denominates automatically. */
trait Tokenizer extends Serializable {
  def name: String

  /** Token count of a text column (BIGINT; 0 for empty/blank text). */
  def count(text: Column): Column
}

/** Whitespace tokens — [[TextAnalysis.tokenCount]]'s compiled one-pass
  * kernel. The default unit everywhere a query says `n_tokens`. */
object WhitespaceTokenizer extends Tokenizer {
  override val name = "whitespace"
  override def count(text: Column): Column = TextAnalysis.tokenCount(text)
}

/** BPE-style PRE-tokenization count (the GPT-2 pattern family, kept
  * lookahead-free so Java regex and DuckDB's RE2 agree match-for-match):
  * contraction suffixes, letter runs, digit runs, and punctuation runs
  * each count as one pre-token; whitespace itself is none. Real token
  * budgets are denominated in subword tokens ≥ pre-tokens, so this is
  * the closer accounting unit while staying deterministic and
  * vocab-free. `regexp_count` is codegen'd — one compiled pass per doc,
  * like the whitespace kernel. */
object RegexBpeTokenizer extends Tokenizer {
  override val name = "regex-bpe"

  /** Alternation order matters (leftmost-first in both engines): the
    * contraction branch must win over the punctuation-run branch at an
    * apostrophe. */
  val pattern: String = "'(?:s|t|re|ve|m|ll|d)|\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"

  override def count(text: Column): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** The same count as DuckDB SQL over `arg` — the oracle side of every
    * query that counts with this tokenizer. */
  def countSql(arg: String): String = {
    val quoted = pattern.replace("'", "''")
    s"CAST(len(regexp_extract_all($arg, '$quoted')) AS BIGINT)"
  }
}

/** TRUE subword counting through the same seam: a merges-table BPE
  * (the GPT-2 encode loop — lowest-rank adjacent pair fuses first,
  * repeatedly) over [[RegexBpeTokenizer]]'s pre-token stream, compiled
  * into one pass per document ([[graft.expr.BpeCount]]). Training-data
  * budgets are denominated in subword tokens, and this is that unit:
  * plug a production merges file into the constructor and every
  * budget/packing operator re-denominates without change. */
class MergesBpeTokenizer(merges: Seq[(String, String)]) extends Tokenizer {
  override val name = "merges-bpe"

  val encoder = new graft.expr.BpeEncoder(merges, RegexBpeTokenizer.pattern)

  override def count(text: Column): Column =
    graft.expr.hfunctions.bpe_count(text, encoder)
}

object MergesBpeTokenizer {
  /** Tiny deterministic fixture vocabulary for oracle-checked queries:
    * multi-level merges (BU+I, IN+G), repeated applications (UR, HO
    * twice in one word), and rank-precedence cases (IN outranks ER
    * inside "MACHINERY"). Under this table the five TPC-H market
    * segments encode to known counts — independently derived from a
    * separate reference implementation of the merge loop and pinned in
    * TokenizerSpec — so a DuckDB oracle states them as literals instead
    * of replaying BPE in SQL:
    * AUTOMOBILE→8, BUILDING→3, FURNITURE→7, MACHINERY→7, HOUSEHOLD→6;
    * digits carry no merges, so a number contributes its digit count. */
  val fixtureMerges: Seq[(String, String)] = Seq(
    ("I", "N"), ("IN", "G"), ("E", "R"), ("O", "M"), ("U", "R"),
    ("H", "O"), ("L", "D"), ("B", "U"), ("BU", "I"), ("A", "U"))

  /** The fixture-table segment counts (see above) as an oracle SQL CASE
    * over a market-segment expression. */
  def segmentCountSql(arg: String): String =
    s"""CAST(CASE $arg
       |  WHEN 'AUTOMOBILE' THEN 8 WHEN 'BUILDING' THEN 3
       |  WHEN 'FURNITURE' THEN 7 WHEN 'MACHINERY' THEN 7
       |  WHEN 'HOUSEHOLD' THEN 6 END AS BIGINT)""".stripMargin

  val fixture = new MergesBpeTokenizer(fixtureMerges)
}

/** Distributed BPE tokenizer TRAINING (Sennrich-style merge learning) —
  * the other half of the [[MergesBpeTokenizer]] seam: p22/p23 APPLY a
  * merges table; this learns one from the corpus.
  *
  * The classic two-phase trainer shape, kept Spark-first:
  *  - ONE corpus-sized pass reduces the corpus to the (word, count)
  *    dictionary — after that, every merge round costs O(|dict|), never
  *    O(corpus), which is why BPE training scales to 100 TB at all (the
  *    dict is bounded by the vocabulary, not the token stream);
  *  - each round: count adjacent token pairs (weighted by word count,
  *    overlapping occurrences counted — the standard convention), take
  *    the global argmax with a deterministic (freq desc, pair asc)
  *    tie-break, and fuse that pair everywhere.
  *
  * Token sequences are carried as DELIMITER-ENCODED strings — word
  * "abc" ⇒ `_a__b__c_`, every token wrapped in `_…_` — because then
  * `replace(e, "_x__y_", "_xy_")` IS the BPE merge step: plain
  * left-to-right non-overlapping string replacement (identical
  * semantics in Spark and DuckDB) fuses exactly the occurrences BPE
  * fuses, consecutive hits included (the shared `__` separator leaves
  * one `_` on each side), and can never match across token boundaries
  * (tokens are `[a-z]+`, so `_x_` occurs iff x is a complete token).
  * That makes the whole trainer engine-portable: the oracle replays it
  * as R rounds of unrolled SQL, bit for bit.
  *
  * The per-round argmax is a driver `collect` of ONE row (the
  * bounded-collect convention); the dict stays cached across rounds. */
object BpeTrainer {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  /** One learned merge: round (1-based), the fused pair, its pre-merge
    * weighted frequency. */
  case class LearnedMerge(r: Int, x: String, y: String, freq: Long)

  /** Corpus → (word, count) over lowercase alpha runs — the only
    * corpus-sized job in the trainer. */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** word → its delimiter-encoded single-char token sequence: one
    * codegen'd regexp_replace (each char `c` ⇒ `_c_`; concatenation
    * yields the shared `__` separators). */
  private def encodeChars(w: Column): Column =
    regexp_replace(w, "(.)", "_$1_")

  /** Learn `rounds` merges from a (w, cnt) dictionary. */
  def trainMerges(dict: DataFrame, rounds: Int): Seq[LearnedMerge] = {
    val base = dict.select(encodeChars(col("w")).as("e"), col("cnt")).cache()
    try {
      val merges = Seq.newBuilder[LearnedMerge]
      var cur = base
      for (r <- 1 to rounds) {
        val toks = split(trim(col("e"), "_"), "__")
        val pairs = when(size(toks) >= 2,
            transform(sequence(lit(1), size(toks) - 1),
              i => struct(element_at(toks, i).as("x"), element_at(toks, i + 1).as("y"))))
          .otherwise(array().cast("array<struct<x:string,y:string>>"))
        val best = cur.select(explode(pairs).as("p"), col("cnt"))
          .groupBy(col("p.x").as("x"), col("p.y").as("y"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("x"), col("y"))
          .limit(1).collect()
        if (best.isEmpty) return merges.result() // dict exhausted (all words fused)
        val b = best.head
        val (x, y, c) = (b.getString(0), b.getString(1), b.getLong(2))
        merges += LearnedMerge(r, x, y, c)
        cur = cur.withColumn("e",
          org.apache.spark.sql.functions.replace(col("e"),
            lit(s"_${x}__${y}_"), lit(s"_${x}${y}_")))
      }
      merges.result()
    } finally { base.unpersist(blocking = false); () }
  }

  /** The learned merges as a frame — the t20 query surface. */
  def trainedMergesDf(spark: SparkSession, docs: DataFrame, textCol: String,
                      rounds: Int): DataFrame = {
    import spark.implicits._
    trainMerges(wordDict(docs, textCol), rounds)
      .toDF("r", "x", "y", "freq")
  }
}
