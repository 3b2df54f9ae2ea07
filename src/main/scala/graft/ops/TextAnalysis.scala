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

  /** One compiled pass computing every per-document statistic
    * ([[graft.expr.TextStats]]): counts + profile hit counts for
    * [[defaultProfiles]] (hits(i) = i-th profile, in order). All
    * stats-derived columns below build the IDENTICAL expression, so
    * codegen subexpression elimination runs the kernel once per row no
    * matter how many features a projection asks for. */
  def stats(text: Column): Column =
    graft.expr.hfunctions.text_stats(text, defaultProfiles.map(_._2))

  def tokenCount(text: Column): Column = stats(text).getField("n_tokens")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokenCount(text: Column): Column = stats(text).getField("n_bpeish")

  /** Language profiles: characteristic high-frequency words per language.
    * Real deployments plug in real stopword lists; the scoring machinery
    * is the operator. */
  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "value", "table", "row"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "customer", "hash"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "pas", "une", "scan", "query"),
    "es" -> Seq("el", "la", "y", "los", "es", "no", "con", "una", "slow", "agg"))

  /** hits of an arbitrary word list among the tokens (generic HOF form;
    * the [[defaultProfiles]] hot path reads the compiled stats instead) */
  def profileHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words.map(lit(_))))).cast("long")

  /** n-gram-heuristic language id: argmax of profile hit counts, ties
    * broken by language code (deterministic). Hit counts come from the
    * one-pass stats kernel. */
  def langId(text: Column, profiles: Seq[(String, Seq[String])] = defaultProfiles): Column = {
    val hits: Int => Column =
      if (profiles == defaultProfiles) {
        val h = stats(text).getField("hits")
        i => element_at(h, i + 1)
      } else {
        val toks = tokens(text)
        i => profileHits(toks, profiles(i)._2)
      }
    // argmax as ONE array_max over (score, rank, lang) structs — struct
    // ordering is lexicographic, and rank = position in DESCENDING lang
    // order, so a score tie resolves to the smallest lang code. A nested
    // when()-reduce here builds an exponentially-sized tree (each level
    // copies its operands into condition and both branches), which blows
    // up planning and can fall out of codegen when re-inlined downstream.
    val langsDesc = profiles.map(_._1).sorted.reverse
    val entries = profiles.zipWithIndex.map { case ((lang, _), i) =>
      struct(hits(i).as("score"), lit(langsDesc.indexOf(lang)).as("rk"), lit(lang).as("lang"))
    }
    array_max(array(entries: _*)).getField("lang")
  }

  /** Repetition features (Gopher-style corpus filters): distinct-token
    * and top-token-frequency ratios, from the one-pass stats kernel. A
    * boilerplate-heavy or degenerate (repeated-token) document shows a
    * low distinct_ratio / high top_ratio. */
  def repetitionFeatures(text: Column): Seq[(String, Column)] = {
    val st = stats(text)
    val nToks = st.getField("n_tokens")
    Seq(
      "n_tokens" -> nToks,
      "n_distinct" -> st.getField("n_distinct"),
      "distinct_ratio" -> when(nToks > 0,
        st.getField("n_distinct").cast("double") / nToks).otherwise(0.0),
      "top_ratio" -> when(nToks > 0,
        st.getField("max_token_count").cast("double") / nToks).otherwise(0.0))
  }

  /** Quality features (counts + bit-identical ratios) from the one-pass
    * stats kernel. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val st = stats(text)
    val nChars = st.getField("n_chars")
    val nToks = st.getField("n_tokens")
    val nPunct = st.getField("n_punct")
    val nAlpha = st.getField("n_alpha")
    val nStop = element_at(st.getField("hits"), 1)
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

  /** PII redaction patterns, applied IN ORDER (email → IPv4 → phone; the
    * order matters — phone-ish digit runs inside an IP must already be
    * gone). The regex subset is common to Java (Spark) and RE2 (the
    * DuckDB oracle applies the identical patterns), and replacement
    * tokens contain no digits so later patterns never re-match earlier
    * redactions. Real deployments extend the list; the fold is the
    * operator. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d[\\d -]{7,}\\d" -> "<PHONE>")

  /** Scrub emails / IPv4s / phone-like runs from free text — the standard
    * pre-training privacy gate. Pure per-row projection (codegen'd
    * regexp_replace chain): no shuffle, scales with the scan. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Canonicalize a URL for dedup — the crawl-side twin of text
    * fingerprinting. Steps (each a codegen'd regex, no UDF):
    * drop the #fragment; drop utm_* / fbclid / gclid tracking params
    * (repairing a leading '&' that loses its '?'); drop a trailing '?',
    * '&' or '/'; lowercase the scheme://host (paths stay case-sensitive).
    * Two URLs that differ only by tracking noise map to one key. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noTrack = regexp_replace(noFrag, "[?&](utm_[A-Za-z]+|fbclid|gclid)=[^&#]*", "")
    val fixedQ = regexp_replace(noTrack, "^([^?]*)&", "$1?")
    val trimmed = regexp_replace(regexp_replace(fixedQ, "[?&]+$", ""), "/+$", "")
    concat(
      lower(regexp_extract(trimmed, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
      regexp_replace(trimmed, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""))
  }

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

  // ------------------------------------------------------------------
  // C4-style line cleaning + Gopher document rules
  // ------------------------------------------------------------------

  /** Boilerplate needles for [[c4KeptLines]] (case-insensitive
    * substring match): template debris the C4 heuristics drop at line
    * granularity. Real deployments extend the list; the filter shape is
    * the operator. */
  val c4Blacklist: Seq[String] = Seq("lorem ipsum", "javascript", "{", "}")

  /** C4-style line filter (the Raffel et al. 2020 §2.2 page-cleaning
    * heuristics, re-expressed as engine-portable predicates): a line
    * survives iff it ends in terminal punctuation ('.', '!', '?' or
    * '"'), carries at least `minLineWords` whitespace words, and its
    * lowercase form contains no [[c4Blacklist]] needle. Returns the
    * ARRAY of kept lines in order — per-row array work only, no
    * shuffle; the cleaned document is `array_join(_, "\n")`. */
  def c4KeptLines(text: Column, minLineWords: Int = 3): Column =
    filter(split(text, "\n"), l => {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(split(t, "\\s+")) >= minLineWords &&
        !c4Blacklist.map(b => lower(l).contains(b)).reduce(_ || _)
    })

  /** Gopher document-quality rules (Rae et al. 2021 Table A1, the
    * deterministic-core subset) as a FAILURE bitmask — bit set = rule
    * violated, 0 = the document passes. Bits:
    *   0  word count outside [minWords, maxWords]
    *   1  mean word length outside [3, 10]
    *   2  symbol-to-word ratio ('#' or '...') > 0.1
    *   3  > 90% of lines start with a bullet (-, *, •)
    *   4  > 30% of lines end with an ellipsis
    *   5  < 80% of words contain an alphabetic character
    *   6  fewer than 2 stopword hits (the en profile of [[stats]])
    *
    * All counts are exact integers from the one-pass stats kernel or a
    * single HOF/regex pass; every ratio is one double division of exact
    * integers, so the mask is bit-identical across engines. Map-only:
    * scales with the scan. */
  def gopherRuleBits(text: Column, minWords: Int = 50,
                     maxWords: Int = 100000): Column = {
    val st = stats(text)
    val nToks = st.getField("n_tokens")
    val nChars = st.getField("n_chars")
    val meanLen = when(nToks > 0,
      (nChars - (nToks - 1)).cast("double") / nToks).otherwise(0.0)
    val alphaWords = size(filter(tokens(text), t => t.rlike("[A-Za-z]"))).cast("long")
    val alphaRatio = when(nToks > 0, alphaWords.cast("double") / nToks).otherwise(0.0)
    val symbols = regexp_count(text, lit("#|\\.\\.\\.")).cast("long")
    val symbolRatio = when(nToks > 0, symbols.cast("double") / nToks).otherwise(0.0)
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("long")
    val ellipsisLines = size(filter(lines, l => trim(l).rlike("\\.\\.\\.$"))).cast("long")
    val bulletRatio = when(nLines > 0, bulletLines.cast("double") / nLines).otherwise(0.0)
    val ellipsisRatio = when(nLines > 0, ellipsisLines.cast("double") / nLines).otherwise(0.0)
    val nStop = element_at(st.getField("hits"), 1)
    def bit(i: Int, failed: Column): Column =
      when(failed, lit(1L << i)).otherwise(lit(0L))
    bit(0, nToks < minWords || nToks > maxWords) +
      bit(1, meanLen < 3.0 || meanLen > 10.0) +
      bit(2, symbolRatio > 0.1) +
      bit(3, bulletRatio > 0.9) +
      bit(4, ellipsisRatio > 0.3) +
      bit(5, alphaRatio < 0.8) +
      bit(6, nStop < 2)
  }

  /** C4 line cleaning + Gopher rules end-to-end: clean each document at
    * line granularity ([[c4KeptLines]]), then judge the CLEANED text
    * against the Gopher mask ([[gopherRuleBits]]) — the standard
    * two-stage web-corpus quality gate. Pure projection (one row in,
    * one row out, no shuffle — the gate parallelizes with the scan);
    * callers filter on `gopher_pass = 1` downstream. Output: idCol,
    * n_lines, n_kept, clean_text, n_tokens, rule_bits, gopher_pass. */
  def c4GopherClean(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, minLineWords: Int = 3, minWords: Int = 50,
                    maxWords: Int = 100000): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol),
        org.apache.spark.sql.functions.size(split(col(textCol), "\n")).cast("long").as("n_lines"),
        c4KeptLines(col(textCol), minLineWords).as("_kept"))
      .select(col(idCol), col("n_lines"),
        org.apache.spark.sql.functions.size(col("_kept")).cast("long").as("n_kept"),
        array_join(col("_kept"), "\n").as("clean_text"))
      .select(col(idCol), col("n_lines"), col("n_kept"), col("clean_text"),
        stats(col("clean_text")).getField("n_tokens").as("n_tokens"),
        gopherRuleBits(col("clean_text"), minWords, maxWords).as("rule_bits"))
      .withColumn("gopher_pass",
        when(col("rule_bits") === 0L, lit(1L)).otherwise(lit(0L)))

  // ---- Gopher REPETITION filters (Rae et al. 2021, Table A1) ----
  // The repetition half of the Gopher suite: line-level duplicate
  // fractions plus n-gram character-coverage fractions. All fractions
  // are exact ppm integers (order-free, engine-exact). Every shuffle
  // below is keyed by doc_id (or doc_id+gram) — per-doc windows, never
  // a global exchange — so the family scales with documents.

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.expressions.Window

  /** Duplicate-BLOCK fractions (shared core of the line and paragraph
    * metrics): occurrences beyond the first of each distinct non-blank
    * block are duplicates. Output columns carry `unit`'s name. */
  private def blockRepetition(docs: DataFrame, idCol: String, textCol: String,
                              sep: String, unit: String): DataFrame = {
    val blocks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), sep)).as("raw"))
      .select(col("doc_id"), trim(col("raw")).as("blk"))
      .filter(length(col("blk")) > 0)
    blocks
      .groupBy(col("doc_id"), col("blk"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as(s"n_${unit}s"),
        sum(col("cnt") - 1).as("_dup"),
        sum(col("cnt") * length(col("blk")).cast("long")).as("_chars"),
        sum((col("cnt") - 1) * length(col("blk")).cast("long")).as("_dupChars"))
      .select(col("doc_id"), col(s"n_${unit}s"),
        expr(s"(_dup * 1000000L) div n_${unit}s").as(s"dup_${unit}_ppm"),
        when(col("_chars") > 0, expr("(_dupChars * 1000000L) div _chars"))
          .otherwise(lit(0L)).as(s"dup_${unit}_char_ppm"))
  }

  /** Duplicate-LINE fractions: occurrences beyond the first of each
    * distinct non-blank line are duplicates.
    * Output: doc_id, n_lines, dup_line_ppm (duplicate occurrences /
    * lines), dup_line_char_ppm (their characters / line characters). */
  def lineRepetition(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    blockRepetition(docs, idCol, textCol, "\n", "line")

  /** Duplicate-PARAGRAPH fractions (blank-line-separated blocks) —
    * Gopher's paragraph duplicates next to the line duplicates.
    * Output: doc_id, n_paras, dup_para_ppm, dup_para_char_ppm. */
  def paraRepetition(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    blockRepetition(docs, idCol, textCol, "\n\\s*\n", "para")

  /** Word tokens of the whitespace-NORMALIZED text with their character
    * offsets in it: (doc_id, p, tok, cs) where cs is the token's char
    * start and tokens are single-space separated. The cumulative-sum
    * window partitions by doc — each partition is one document. */
  private def tokenPositions(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        regexp_replace(trim(col(textCol)), "\\s+", " ").as("t"))
      .filter(length(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        posexplode(split(col("t"), " ")).as(Seq("p", "tok")))
      .withColumn("cs",
        sum(length(col("tok")).cast("long") + 1L)
          .over(Window.partitionBy("doc_id").orderBy("p"))
          - length(col("tok")).cast("long") - 1L)
      .select(col("doc_id"), col("p"), col("tok"), col("cs"))

  /** Word n-gram occurrences with char intervals over the normalized
    * text: (doc_id, p, g, s, e) — [s, e) covers the n tokens and their
    * n-1 separating spaces. */
  private def ngramIntervals(tp: DataFrame, n: Int): DataFrame = {
    require(n >= 2, s"n-gram repetition needs n >= 2, got $n")
    val w = Window.partitionBy("doc_id").orderBy("p")
    val gram = concat_ws(" ",
      (0 until n).map(i => if (i == 0) col("tok") else lead(col("tok"), i).over(w)): _*)
    val lastEnd = lead(col("cs") + length(col("tok")).cast("long"), n - 1).over(w)
    tp.select(col("doc_id"), col("p"), col("cs").as("s"),
        lastEnd.as("e"), gram.as("g"))
      .filter(col("e").isNotNull)
  }

  /** TOP n-gram character coverage (Gopher n ∈ {2,3,4}): characters
    * covered by the most frequent word n-gram as ppm of the normalized
    * text. Coverage = count × gram-char-length; among tied counts the
    * largest coverage wins (deterministic in both engines).
    * Output: doc_id, n_chars, top_ngram_char_ppm. */
  def topNgramCharFrac(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val tp = tokenPositions(docs, idCol, textCol)
    val lens = tp.groupBy("doc_id")
      .agg((sum(length(col("tok")).cast("long")) + count(lit(1)) - 1L).as("n_chars"),
        count(lit(1)).as("n_toks"))
    val byGram = ngramIntervals(tp, n)
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("cnt"), first(col("e") - col("s")).as("glen"))
    val top = byGram
      .groupBy(col("doc_id"))
      .agg(max(struct(col("cnt"), (col("cnt") * col("glen")).as("cov"))).as("_b"))
      .select(col("doc_id"), col("_b.cov").as("_cov"))
    lens.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        when(col("_cov").isNotNull && col("n_chars") > 0,
          expr("(_cov * 1000000L) div n_chars")).otherwise(lit(0L))
          .as("top_ngram_char_ppm"))
  }

  /** DUPLICATE n-gram character coverage (Gopher n ∈ {5..10}):
    * characters inside ANY n-gram that occurs more than once in the
    * document, overlapping occurrences counted ONCE (interval union via
    * the classic running-max window — per doc, never global), as ppm of
    * the normalized text. Output: doc_id, n_chars, dup_ngram_char_ppm. */
  def dupNgramCharFrac(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val tp = tokenPositions(docs, idCol, textCol)
    val lens = tp.groupBy("doc_id")
      .agg((sum(length(col("tok")).cast("long")) + count(lit(1)) - 1L).as("n_chars"))
    val iv = ngramIntervals(tp, n)
    val dupIv = iv.withColumn("_cnt",
        count(lit(1)).over(Window.partitionBy("doc_id", "g")))
      .filter(col("_cnt") > 1)
      .select(col("doc_id"), col("s"), col("e"))
    val wOrd = Window.partitionBy("doc_id").orderBy(col("s"), col("e"))
    val merged = dupIv
      .withColumn("_pmax",
        max(col("e")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_pmax").isNull || col("s") > col("_pmax"), 1L).otherwise(0L))
      .withColumn("_grp", sum(col("_new")).over(wOrd))
      .groupBy(col("doc_id"), col("_grp"))
      .agg((max(col("e")) - min(col("s"))).as("_len"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_len")).as("_cov"))
    lens.join(merged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        when(col("_cov").isNotNull && col("n_chars") > 0,
          expr("(_cov * 1000000L) div n_chars")).otherwise(lit(0L))
          .as("dup_ngram_char_ppm"))
  }

  /** The composed repetition GATE: line + paragraph duplicates, a
    * top-2-gram probe, and a dup-5-gram probe against the published
    * Gopher thresholds (dup lines/paras > 30%, their char fractions
    * > 20%, top 2-gram > 20%, dup 5-gram > 15% — each expressed in
    * ppm). The full paper sweep is this with n = 3,4 top probes and
    * n = 6..10 dup probes unioned in — same operators, more calls.
    *
    * Every feature is per-doc pure, so the gate runs as ONE map-only
    * pass through the compiled [[RepetitionKernel]] behind a typed map
    * (the object boundary also guarantees one kernel evaluation per
    * row) — the composable relational forms ([[lineRepetition]],
    * [[topNgramCharFrac]], [[dupNgramCharFrac]]) each re-scan and
    * shuffle by doc_id, which is the right shape for a single probe
    * but 6+ corpus scans for the composed gate.
    * [[TextAnalysisSpec]] pins kernel ≡ relational equality. */
  def repetitionGate(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val a = RepetitionKernel.compute(text)
        val pass =
          if (a(1) <= 300000L && a(2) <= 200000L &&
            a(4) <= 300000L && a(5) <= 200000L &&
            a(6) <= 200000L && a(8) <= 150000L) 1L else 0L
        (id, a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7), a(8), pass)
      }
      .toDF("doc_id", "n_lines", "dup_line_ppm", "dup_line_char_ppm",
        "n_paras", "dup_para_ppm", "dup_para_char_ppm",
        "top2_char_ppm", "n_chars", "dup5_char_ppm", "rep_pass")
  }
}

/** One-pass per-document kernel behind [[TextAnalysis.repetitionGate]].
  * Reproduces the relational forms' semantics EXACTLY (the DuckDB
  * oracle replays the relational formulation, so the two must stay
  * bit-identical; pinned in TextAnalysisSpec):
  *  - `trim` strips SPACES only (Spark `trim` semantics);
  *  - lengths count Unicode CODE POINTS (Spark `length`);
  *  - lines split on `\n`, paragraphs on `\n\s*\n`, blanks dropped
  *    after the space-trim;
  *  - n-grams run over the whitespace-NORMALIZED text (`\s+` → one
  *    space) with char offsets cs_p = Σ_{q<p}(len_q + 1);
  *  - top-2-gram coverage = max count, ties by max count×gram-length;
  *  - dup-5-gram coverage = interval union ordered by (start, end),
  *    touching intervals merging (length-neutral);
  *  - all fractions are `x * 1e6 / y` in Long math (floor on
  *    non-negative operands, matching `div` and DuckDB `//`).
  * Returns [n_lines, dup_line_ppm, dup_line_char_ppm, n_paras,
  * dup_para_ppm, dup_para_char_ppm, top2_char_ppm, n_chars,
  * dup5_char_ppm]; empty units yield zeros, never divide by zero. */
private[ops] object RepetitionKernel {

  private val paraSplit = java.util.regex.Pattern.compile("\n\\s*\n")
  private val wsRun = java.util.regex.Pattern.compile("\\s+")

  private def trimSpaces(s: String): String = {
    var i = 0; var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** (n_blocks, dup_ppm, dup_char_ppm) over trimmed non-blank blocks. */
  private def blockDup(blocks: Array[String]): (Long, Long, Long) = {
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < blocks.length) {
      val b = trimSpaces(blocks(i))
      if (b.nonEmpty) counts.merge(b, 1L, java.lang.Long.sum)
      i += 1
    }
    var n = 0L; var dup = 0L; var chars = 0L; var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val len = cp(e.getKey); val cnt = e.getValue
      n += cnt; dup += cnt - 1
      chars += cnt * len; dupChars += (cnt - 1) * len
    }
    if (n == 0L) (0L, 0L, 0L)
    else (n, dup * 1000000L / n,
      if (chars > 0L) dupChars * 1000000L / chars else 0L)
  }

  def compute(text: String): Array[Long] = {
    val (nLines, dupLine, dupLineChar) = blockDup(text.split("\n", -1))
    val (nParas, dupPara, dupParaChar) = blockDup(paraSplit.split(text, -1))

    val norm = wsRun.matcher(trimSpaces(text)).replaceAll(" ")
    var top2 = 0L; var nChars = 0L; var dup5 = 0L
    if (norm.nonEmpty) {
      val toks = norm.split(" ", -1)
      val n = toks.length
      val lens = new Array[Long](n)
      val cs = new Array[Long](n)
      var acc = 0L
      var i = 0
      while (i < n) {
        lens(i) = cp(toks(i)); cs(i) = acc; acc += lens(i) + 1; i += 1
      }
      nChars = acc - 1 // Σ len + (n-1)

      if (n >= 2 && nChars > 0) {
        val g2 = new java.util.HashMap[String, Array[Long]]() // (cnt, glen)
        i = 0
        while (i < n - 1) {
          val g = toks(i) + " " + toks(i + 1)
          val e = g2.get(g)
          if (e == null) g2.put(g, Array(1L, lens(i) + lens(i + 1) + 1L))
          else e(0) += 1L
          i += 1
        }
        var maxCnt = 0L; var maxCov = 0L
        val it = g2.values().iterator()
        while (it.hasNext) {
          val e = it.next()
          val cov = e(0) * e(1)
          if (e(0) > maxCnt || (e(0) == maxCnt && cov > maxCov)) {
            if (e(0) > maxCnt) { maxCnt = e(0); maxCov = cov }
            else maxCov = cov
          }
        }
        top2 = maxCov * 1000000L / nChars
      }

      if (n >= 5 && nChars > 0) {
        val cnt5 = new java.util.HashMap[String, Long]()
        i = 0
        while (i <= n - 5) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < 5) { sb.append(' ').append(toks(i + j)); j += 1 }
          cnt5.merge(sb.toString, 1L, java.lang.Long.sum)
          i += 1
        }
        val iv = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        i = 0
        while (i <= n - 5) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < 5) { sb.append(' ').append(toks(i + j)); j += 1 }
          if (cnt5.get(sb.toString) > 1L)
            iv += ((cs(i), cs(i + 4) + lens(i + 4)))
          i += 1
        }
        if (iv.nonEmpty) {
          val sorted = iv.sortBy(identity)
          var cov = 0L
          var (cs0, ce0) = sorted.head
          var k = 1
          while (k < sorted.length) {
            val (s, e) = sorted(k)
            if (s > ce0) { cov += ce0 - cs0; cs0 = s; ce0 = e }
            else if (e > ce0) ce0 = e
            k += 1
          }
          cov += ce0 - cs0
          dup5 = cov * 1000000L / nChars
        }
      }
    }
    Array(nLines, dupLine, dupLineChar, nParas, dupPara, dupParaChar,
      top2, nChars, dup5)
  }
}
