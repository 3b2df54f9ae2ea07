package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID, document fingerprints.
  *
  * Everything is built from codegen'd `functions._` expressions — no UDFs
  * — so the whole feature computation runs inside whole-stage codegen and
  * scales linearly with input splits (no shuffle at all for per-document
  * features).
  *
  * Determinism note: ratios are single double divisions of exact integer
  * counts, so results are bit-identical across engines (the DuckDB oracle
  * computes the same counts).
  */
object TextAnalysis {

  /** whitespace tokens of trimmed text */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text))).cast("long")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0))).cast("long")

  /** Language profiles: characteristic high-frequency words per language.
    * Real deployments plug in real stopword lists; the scoring machinery
    * is the operator. */
  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "value", "table", "row"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "customer", "hash"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "pas", "une", "scan", "query"),
    "es" -> Seq("el", "la", "y", "los", "es", "no", "con", "una", "slow", "agg"))

  /** hits of a word list among the tokens */
  def profileHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words.map(lit(_))))).cast("long")

  /** n-gram-heuristic language id: argmax of profile hit counts, ties
    * broken by language code (deterministic). */
  def langId(text: Column, profiles: Seq[(String, Seq[String])] = defaultProfiles): Column = {
    val toks = tokens(text)
    val scored = profiles.map { case (lang, words) =>
      struct(profileHits(toks, words).as("score"), lit(lang).as("lang"))
    }
    // max by (score, reversed-lang) — i.e. highest score, then smallest lang code
    val best = scored.reduce { (a, b) =>
      when(b.getField("score") > a.getField("score") ||
        (b.getField("score") === a.getField("score") && b.getField("lang") < a.getField("lang")), b)
        .otherwise(a)
    }
    best.getField("lang")
  }

  /** Quality features (counts + bit-identical ratios). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nChars = length(text).cast("long")
    val nToks = tokenCount(text)
    val nPunct = size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0))).cast("long")
    val nAlpha = size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0))).cast("long")
    val nStop = profileHits(tokens(text), defaultProfiles.head._2)
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "n_punct" -> nPunct,
      "mean_token_len" -> when(nToks > 0, (nChars - (nToks - 1)).cast("double") / nToks).otherwise(0.0),
      "punct_ratio" -> when(nChars > 0, nPunct.cast("double") / nChars).otherwise(0.0),
      "alpha_ratio" -> when(nChars > 0, nAlpha.cast("double") / nChars).otherwise(0.0),
      "stopword_ratio" -> when(nToks > 0, nStop.cast("double") / nToks).otherwise(0.0))
  }

  /** Composite quality score in [0,1]: weighted, deterministic double math. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lengthOk = when(f("n_chars") >= 100 && f("n_chars") <= 10000, 1.0).otherwise(0.0)
    least(lit(1.0), greatest(lit(0.0),
      lit(0.4) * lengthOk + lit(0.3) * f("alpha_ratio") + lit(0.3) * f("stopword_ratio")))
  }

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed
    * text — the exact-dedup key that survives formatting noise. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Overlapping token-window chunking — the standard "document →
    * training sequences" step: chunk i covers tokens
    * [i·stride, i·stride + size) with start positions 0, stride, 2·stride
    * … < n_tokens; tail chunks may be shorter; empty docs yield none.
    * Pure generate-then-project: one row per chunk, no shuffle — the
    * chunk explosion parallelizes with the scan. Output: idCol, chunk_id,
    * n_chunk_tokens, chunk_text. */
  def chunk(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
            size: Int = 100, stride: Int = 80): org.apache.spark.sql.DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val toks = tokens(col(textCol))
    val n = tokenCount(col(textCol))
    docs
      .select(col(idCol), toks.as("_tk"), n.as("_n"))
      .filter(col("_n") > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), floor((col("_n") - 1) / stride).cast("long"))).as("chunk_id"),
        col("_tk"))
      .select(col(idCol), col("chunk_id"),
        slice(col("_tk"), (col("chunk_id") * stride + 1).cast("int"), lit(size)).as("_chunk"))
      .select(col(idCol), col("chunk_id"),
        org.apache.spark.sql.functions.size(col("_chunk")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("_chunk")).as("chunk_text"))
  }
}
