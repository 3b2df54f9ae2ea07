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
