package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String

/** Static helpers behind the text-hashing Catalyst expressions
  * ([[ShingleHashes60]], [[MinHashSig]]).
  *
  * All hashes are the same md5-derived 60-bit values the SQL-composable
  * `Dedup.hash60` produces (`conv(substring(md5(s),1,15),16,10)` = the
  * first 15 hex chars of md5 as an unsigned number), so results stay
  * bit-identical with the DuckDB oracle formulation. The point of the
  * compiled path is speed: Spark's higher-order functions (`transform`,
  * `aggregate`) are interpreted per element, which makes
  * shingling+hashing ~20µs/element; one compiled pass per document is
  * two orders of magnitude cheaper and is what survives at 100 TB.
  */
object TextHash {

  /** Modulus of the minhash affine permutations: 2^31-1 (prime). */
  val PermP: Long = 2147483647L
  /** Base hashes are folded to [0, 2^30) so a*h + b stays < 2^63. */
  val PermM: Long = 1L << 30

  /** Deterministic multipliers/offsets (LCG-expanded, odd, < 2^30). One
    * pair per permutation; supports signatures up to length 64. */
  val permA: Array[Long] = (1 to 64).map(i => ((1103515245L * i + 12345L) % PermM) | 1L).toArray
  val permB: Array[Long] = (1 to 64).map(i => (69069L * i + 362437L) % PermM).toArray

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s): equals conv(substring(md5(s),1,15),16,10). */
  def hash60(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xffL) >>> 4)
  }

  /** Trim ASCII spaces only — matching Spark's `trim` (and DuckDB's),
    * which strip ' ' but not other whitespace. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Whitespace tokens of the space-trimmed text — identical to
    * `split(trim(text), "\\s+")`. */
  def tokens(text: UTF8String): Array[String] =
    tokens(text.toString)

  /** String-input twin of [[tokens]] for typed kernels. */
  def tokens(s: String): Array[String] =
    ws.split(trimSpaces(s), -1)

  /** Token count under the engine-wide rule — identical to
    * [[TextStats]]' `n_tokens` field (`when(length(trim(text))===0, 0)
    * .otherwise(size(split(trim(text), "\\s+")))`). */
  def tokenCount(s: String): Long = {
    val toks = tokens(s)
    if (toks.length == 1 && toks(0).isEmpty) 0L else toks.length.toLong
  }

  /** Distinct 60-bit hashes of the word n-gram shingles, in first-
    * occurrence order — identical contents to
    * `array_distinct(transform(<shingles>, hash60))`. Empty when the doc
    * has fewer than n tokens. */
  def shingleHashes60(text: UTF8String, n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val toks = tokens(text)
    if (toks.length < n) return Array.emptyLongArray
    val m = toks.length - n + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(hash60(sb.toString))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    out
  }

  /** POSITIONAL token n-grams as structs of their tokens — the compiled
    * replacement for the interpreted `transform(sequence(1, size-n+1),
    * i -> struct(element_at(tk, i), ...))` HOF chain in the LM/census
    * gram builders (~20µs/element interpreted — see the object
    * docstring). Tokenization is [[tokens]] (≡ `split(trim(text),
    * "\s+")`); texts with fewer than n tokens — including the
    * single-empty-token artifact of splitting empty/whitespace-only
    * text — yield an EMPTY array, so callers need no size() guard
    * (unlike `sequence(1, 0)`, which runs DESCENDING, not empty).
    * Token UTF8Strings are built once and shared across the up-to-n
    * gram structs that reference them. */
  def tokenNgrams(text: UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokens(text.toString)
    if (toks.length < n || (toks.length == 1 && toks(0).isEmpty))
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val us = new Array[UTF8String](toks.length)
    var t = 0
    while (t < toks.length) { us(t) = UTF8String.fromString(toks(t)); t += 1 }
    val m = toks.length - n + 1
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val fields = new Array[Any](n)
      var j = 0
      while (j < n) { fields(j) = us(i + j); j += 1 }
      out(i) =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** POSITIONAL 60-bit k-gram hashes (non-distinct, window order):
    * element i is [[hash60]] of tokens i..i+n-1 joined by single spaces —
    * the positional twin of [[shingleHashes60]], for span-level
    * exact-substring dedup where WHERE a window sits matters. Empty when
    * the doc has fewer than n tokens. */
  def kgramHashes60(text: UTF8String, n: Int): Array[Long] =
    if (text == null) Array.emptyLongArray else kgramHashes60(text.toString, n)

  /** String-input twin of [[kgramHashes60]] for typed kernels (identical
    * output by construction — the UTF8String overload delegates here). */
  def kgramHashes60(s: String, n: Int): Array[Long] = {
    val toks = tokens(s)
    if (toks.length < n || (toks.length == 1 && toks(0).isEmpty))
      return Array.emptyLongArray
    val m = toks.length - n + 1
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = hash60(sb.toString)
      i += 1
    }
    out
  }

  /** Drop every token covered by a k-token window starting at any of
    * `starts` (1-BASED window start positions, duplicates/overlaps fine;
    * starts outside [1, #tokens] are SKIPPED — validated in Long space,
    * so a start like 2^32+1 cannot truncate into a small in-range int);
    * the survivors re-join with single spaces, so output text is
    * whitespace-normalized like every token-level operator here. A
    * no-token text returns the empty string. */
  def removeTokenSpans(text: UTF8String, starts: Array[Long], k: Int): UTF8String = {
    if (text == null) return null
    UTF8String.fromString(removeTokenSpans(text.toString, starts, k))
  }

  /** String-input twin of [[removeTokenSpans]] for typed kernels (the
    * UTF8String overload delegates here; null handling stays with it). */
  def removeTokenSpans(text: String, starts: Array[Long], k: Int): String = {
    val toks = tokens(text)
    if (toks.length == 0 || (toks.length == 1 && toks(0).isEmpty))
      return ""
    val covered = new Array[Boolean](toks.length)
    var i = 0
    while (i < starts.length) {
      val s = starts(i)
      if (s >= 1L && s <= toks.length) {
        var j = (s - 1).toInt
        val end = math.min(toks.length.toLong, s - 1 + k).toInt
        while (j < end) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var first = true
    i = 0
    while (i < toks.length) {
      if (!covered(i)) {
        if (!first) sb.append(' ')
        sb.append(toks(i))
        first = false
      }
      i += 1
    }
    sb.toString
  }

  /** [[removeTokenSpans]] over raw Catalyst array data — the eval/codegen
    * entry point. `ArrayData.toLongArray` silently reads a NULL element
    * as 0 (which the Long-space validation would then skip as out of
    * range, hiding caller bugs); reject nulls loudly instead — this is a
    * registered SQL function, not just an internal kernel. */
  def removeTokenSpans(text: UTF8String,
                       starts: org.apache.spark.sql.catalyst.util.ArrayData,
                       k: Int): UTF8String = {
    val n = starts.numElements()
    var i = 0
    while (i < n) {
      if (starts.isNullAt(i))
        throw new IllegalArgumentException(
          s"remove_token_spans: span-start array contains NULL at position $i")
      i += 1
    }
    removeTokenSpans(text, starts.toLongArray(), k)
  }

  /** Whitespace-NORMALIZED text — the canonical form the char-granular
    * span operators index into: space-trimmed, every `\s+` run collapsed
    * to one space. Identical to
    * `array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')`
    * so oracle char positions line up exactly. */
  def normalizeWs(s: String): String = {
    val toks = tokens(s)
    if (toks.length == 1 && toks(0).isEmpty) "" else toks.mkString(" ")
  }

  /** CODE POINTS of a string — the indexing frame shared by every
    * char-granular span operator. "Char" in this family means Unicode
    * CODE POINT, never UTF-16 code unit: Spark's `length()` and DuckDB's
    * `length`/`substr` both count code points, so kernel positions,
    * batch/stream `n_chars` accounting, and the SQL oracle stay aligned
    * on non-BMP text (emoji, CJK ext-B — exactly the corpora the
    * char-granular operators target), and a cut can never land
    * mid-surrogate-pair. */
  private def codePoints(s: String): Array[Int] = {
    // fast path: a BMP-only string (the overwhelmingly common case) is
    // its own code-point array — skip the streams machinery
    var i = 0
    val n = s.length
    var bmp = true
    while (bmp && i < n) { if (Character.isHighSurrogate(s.charAt(i))) bmp = false; i += 1 }
    if (bmp) {
      val out = new Array[Int](n)
      var j = 0
      while (j < n) { out(j) = s.charAt(j); j += 1 }
      out
    } else s.codePoints().toArray
  }

  /** POSITIONAL 60-bit CHAR k-gram hashes over [[normalizeWs]]'d text —
    * the character-granular twin of [[kgramHashes60]] for the Lee et al.
    * ExactSubstr step on corpora where duplication does not respect
    * token boundaries (OCR, code, CJK). Element i (0-based) is
    * [[hash60]] of normalized CODE POINTS i..i+k-1 (code points, not
    * UTF-16 units — the [[codePoints]] contract that keeps positions
    * aligned with Spark `length()` and the DuckDB oracle's `substr` on
    * non-BMP text); texts shorter than k code points yield no windows.
    * Unlike [[charShingles60]] this keeps EVERY position (non-distinct,
    * in order) — WHERE a window sits is the point. Cost is one md5 per
    * char position (k× the byte volume of a token pass) but stays
    * map-only and embarrassingly parallel; at petabyte scale use
    * [[charKgramHashesRolling]] (O(len), measured 5.8× on the kernel) —
    * the operator contract is only "a strong hash per window", so the
    * swap is behavior-preserving. */
  def charKgramHashes60(text: UTF8String, k: Int): Array[Long] =
    if (text == null) Array.emptyLongArray else charKgramHashes60(text.toString, k)

  /** String-input twin of [[charKgramHashes60]] for typed kernels. */
  def charKgramHashes60(s: String, k: Int): Array[Long] = {
    val cp = codePoints(normalizeWs(s))
    if (cp.length < k) return Array.emptyLongArray
    val m = cp.length - k + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = hash60(new String(cp, i, k)); i += 1 }
    out
  }

  // Rolling char-kgram hash: two independent 31-bit polynomial hashes
  // (Mersenne-prime moduli, distinct bases) packed into one 62-bit value.
  // All products stay under 2^63 in plain Long arithmetic, and the
  // combined width keeps corpus-scale collision odds negligible
  // (birthday at 10^9 grams ≈ 10^-4 per corpus — and a collision can
  // only ever merge two equality classes, i.e. cut one extra window).
  private val RollP1 = 2147483647L // 2^31 - 1
  private val RollP2 = 2147483629L
  private val RollB1 = 131L
  private val RollB2 = 137L

  /** POSITIONAL char k-gram hashes via a ROLLING polynomial — the
    * O(len) scale kernel for [[charKgramHashes60]]'s O(len·k) md5 pass
    * (at petabyte scale the digest is the dominant cost of the
    * char-granular ExactSubstr operator; the operator contract is only
    * "a strong hash per window", and the cut decisions depend on gram
    * EQUALITY classes, so swapping kernels is behavior-preserving —
    * equivalence-spec'd in DedupSpec). Same framing as the md5 form:
    * [[normalizeWs]]'d text, element i hashes chars i..i+k-1, empty
    * below k chars. NOT oracle-SQL-replayable (the driver gate's d30
    * stays on the md5 kernel); this is the documented opt-in for
    * corpora where the hash pass, not the shuffle, is the bill. */
  def charKgramHashesRolling(text: UTF8String, k: Int): Array[Long] =
    if (text == null) Array.emptyLongArray
    else charKgramHashesRolling(text.toString, k)

  /** String-input twin of [[charKgramHashesRolling]]. Windows are CODE
    * POINTS ([[codePoints]]) — same positional frame as the md5 kernel,
    * so the two stay swappable on non-BMP text too. Code-point values
    * reach 0x10FFFF < 2^21, so `h*B + c` still stays under 2^63. */
  def charKgramHashesRolling(s: String, k: Int): Array[Long] = {
    val cp = codePoints(normalizeWs(s))
    if (cp.length < k) return Array.emptyLongArray
    val m = cp.length - k + 1
    val out = new Array[Long](m)
    // B^(k-1) mod P, for the outgoing-char term
    var bk1 = 1L; var bk2 = 1L
    var j = 0
    while (j < k - 1) { bk1 = (bk1 * RollB1) % RollP1; bk2 = (bk2 * RollB2) % RollP2; j += 1 }
    var h1 = 0L; var h2 = 0L
    j = 0
    while (j < k) {
      val c = cp(j).toLong
      h1 = (h1 * RollB1 + c) % RollP1
      h2 = (h2 * RollB2 + c) % RollP2
      j += 1
    }
    out(0) = (h1 << 31) | h2
    var i = 1
    while (i < m) {
      val cOut = cp(i - 1).toLong
      val cIn = cp(i + k - 1).toLong
      h1 = ((h1 + RollP1 - cOut * bk1 % RollP1) % RollP1 * RollB1 + cIn) % RollP1
      h2 = ((h2 + RollP2 - cOut * bk2 % RollP2) % RollP2 * RollB2 + cIn) % RollP2
      out(i) = (h1 << 31) | h2
      i += 1
    }
    out
  }

  /** Drop every CHARACTER of the [[normalizeWs]]'d text covered by a
    * k-char window starting at any of `starts` (1-BASED CODE-POINT
    * positions into the NORMALIZED text — [[charKgramHashes60]]'s frame;
    * duplicates / overlaps fine, out-of-range starts skipped with the
    * same Long-space validation as [[removeTokenSpans]]). Survivors
    * concatenate directly — a cut span can fuse its neighbors
    * ("hell" + "rld"), which IS the ExactSubstr semantics at char
    * granularity. Cover mask and rebuild run over code points, so a cut
    * can never split a surrogate pair and emit lone-surrogate garbage. */
  def removeCharSpans(text: UTF8String, starts: Array[Long], k: Int): UTF8String = {
    if (text == null) return null
    UTF8String.fromString(removeCharSpans(text.toString, starts, k))
  }

  /** String-input twin of [[removeCharSpans]] for typed kernels. */
  def removeCharSpans(s: String, starts: Array[Long], k: Int): String = {
    val cp = codePoints(normalizeWs(s))
    if (cp.length == 0) return ""
    val covered = new Array[Boolean](cp.length)
    var i = 0
    while (i < starts.length) {
      val st = starts(i)
      if (st >= 1L && st <= cp.length) {
        var j = (st - 1).toInt
        val end = math.min(cp.length.toLong, st - 1 + k).toInt
        while (j < end) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(cp.length)
    i = 0
    while (i < cp.length) {
      if (!covered(i)) sb.appendCodePoint(cp(i))
      i += 1
    }
    sb.toString
  }

  /** Code-point count of the [[normalizeWs]]'d text — the `n_chars` the
    * char-granular span operators account in (= Spark `length()` = the
    * DuckDB oracle's `length`), shared by the batch plan and the
    * streaming rebuild so the two never drift on non-BMP text. */
  def normalizedCodePointCount(s: String): Long = {
    val t = normalizeWs(s)
    t.codePointCount(0, t.length).toLong
  }

  /** [[removeCharSpans]] over raw Catalyst array data — the eval/codegen
    * entry point; NULL elements rejected loudly like
    * [[removeTokenSpans]]'s (this too is a registered SQL function). */
  def removeCharSpans(text: UTF8String,
                      starts: org.apache.spark.sql.catalyst.util.ArrayData,
                      k: Int): UTF8String = {
    val n = starts.numElements()
    var i = 0
    while (i < n) {
      if (starts.isNullAt(i))
        throw new IllegalArgumentException(
          s"remove_char_spans: span-start array contains NULL at position $i")
      i += 1
    }
    removeCharSpans(text, starts.toLongArray(), k)
  }

  /** Merge 1-based k-token window start positions into MAXIMAL covered
    * runs: windows at s cover tokens [s, s+k-1]; overlapping or adjacent
    * covers (next start ≤ current end + 1) fuse, so the result is
    * exactly the contiguous true-segments of the boolean cover mask
    * [[removeTokenSpans]] cuts by. Input order is irrelevant (a clone
    * is sorted — the caller's array is never mutated); duplicates are
    * fine. Returns catalyst rows (start, end), inclusive token indices. */
  def mergeWindowRuns(starts0: Array[Long], k: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    mergeOwnedRuns(starts0.clone(), k)

  /** [[mergeWindowRuns]] for an array the callee OWNS (sorted in place,
    * no defensive copy) — the ArrayData entry point hands over the fresh
    * array `toLongArray()` materializes, skipping a second copy on the
    * per-document hot path. */
  private def mergeOwnedRuns(starts: Array[Long], k: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    if (starts.length == 0) return new GenericArrayData(Array.empty[Any])
    java.util.Arrays.sort(starts)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var s = starts(0)
    var e = starts(0) + k - 1
    var i = 1
    while (i < starts.length) {
      val st = starts(i)
      if (st <= e + 1) { val ne = st + k - 1; if (ne > e) e = ne }
      else { out += InternalRow(s, e); s = st; e = st + k - 1 }
      i += 1
    }
    out += InternalRow(s, e)
    new GenericArrayData(out.toArray)
  }

  /** [[mergeWindowRuns]] over raw Catalyst array data — the eval/codegen
    * entry point; NULL elements rejected loudly like
    * [[removeTokenSpans]]'s (this too is a registered SQL function). */
  def mergeWindowRuns(starts: org.apache.spark.sql.catalyst.util.ArrayData,
                      k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = starts.numElements()
    var i = 0
    while (i < n) {
      if (starts.isNullAt(i))
        throw new IllegalArgumentException(
          s"merge_window_runs: start array contains NULL at position $i")
      i += 1
    }
    mergeOwnedRuns(starts.toLongArray(), k)
  }

  /** MinHash signature of a shingle-hash set: element i is
    * `min over h of (permA(i) * (h mod 2^30) + permB(i)) mod (2^31-1)`.
    * Empty input → empty signature. */
  def minhashSig(hs: Array[Long], k: Int): Array[Long] = {
    if (hs.length == 0) return Array.emptyLongArray
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = permA(i)
      val b = permB(i)
      var best = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = (a * (hs(j) % PermM) + b) % PermP
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    out
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken document
    * fingerprinting): hash every char k-gram, slide a window of w
    * consecutive k-gram hashes, keep the minimum of each window; return
    * the distinct selected hashes in first-occurrence order. Guarantees a
    * match for any shared substring of length ≥ k+w-1 while storing only
    * ~1/w of the hashes. Texts shorter than k yield nothing; with fewer
    * than w k-grams the single window spans them all. */
  def winnow(text: UTF8String, k: Int, w: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val s = text.toString
    if (s.length < k) return Array.emptyLongArray
    val m = s.length - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = hash60(s.substring(i, i + k)); i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (m < w) {
      var best = Long.MaxValue
      var j = 0
      while (j < m) { if (hs(j) < best) best = hs(j); j += 1 }
      seen.add(best)
    } else {
      var j = 0
      while (j <= m - w) {
        var best = Long.MaxValue
        var t = j
        while (t < j + w) { if (hs(t) < best) best = hs(t); t += 1 }
        seen.add(best)
        j += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    out
  }

  /** SimHash fingerprint over whitespace tokens (with multiplicity):
    * bit j of the result is set iff the ±1 votes of token-hash bit j sum
    * positive. Null/empty token list → null (boxed). */
  def simhash(text: UTF8String, bits: Int): java.lang.Long = {
    if (text == null) return null
    val toks = tokens(text)
    if (toks.length == 0 || (toks.length == 1 && toks(0).isEmpty)) return null
    val votes = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      val h = hash60(toks(i))
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  /** Distinct 60-bit hashes of all k-CHARACTER substrings — the
    * char-shingle primitive for edit-level similarity banding: a
    * character substitution destroys only the k substrings covering it,
    * where it rewrites every WORD shingle containing the word. One
    * compiled pass; no canonicalization (edit distance is about the
    * exact characters). Texts shorter than k yield no shingles. */
  def charShingles60(text: UTF8String, k: Int): Array[Long] =
    charShingles60(text, k, 1)

  /** [[charShingles60]] with deterministic MOD-P SAMPLING: keep only
    * grams whose hash ≡ 0 (mod `sampleMod`) — the winnowing-style
    * density lever for gram-join volume. Sampling is a pure function of
    * CONTENT (never position or RNG), so two docs' sampled sets overlap
    * in the same proportion as their full sets in expectation, and both
    * engines sample identically. `sampleMod = 1` keeps everything. */
  def charShingles60(text: UTF8String, k: Int, sampleMod: Int): Array[Long] =
    charShingles60(text.toString, k, sampleMod)

  /** String-input twin of [[charShingles60]] for typed kernels that
    * already hold a decoded String (identical output by construction —
    * the UTF8String overload delegates here). */
  def charShingles60(s: String, k: Int, sampleMod: Int): Array[Long] = {
    if (s.length < k) return Array.emptyLongArray
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](s.length - k + 1)
    var i = 0
    while (i + k <= s.length) {
      val h = hash60(s.substring(i, i + k))
      if ((sampleMod <= 1 || h % sampleMod == 0) && seen.add(h)) out += h
      i += 1
    }
    out.toArray
  }

  /** Threshold-bounded Levenshtein distance (classic Ukkonen band,
    * O(maxDist · min len) with early exit when an entire band row
    * exceeds the bound): the exact distance when ≤ `t`, else −1 —
    * value-identical to Spark's `levenshtein(a, b, t)` on BMP text.
    * The built-in's interpreted path walks UTF8 bytes per character
    * access and measured ~5 ms per ~300-char pair (it dominated d21's
    * whole runtime); this kernel decodes once and runs the band on
    * char arrays. */
  def boundedLevenshtein(a: UTF8String, b: UTF8String, t: Int): Long =
    boundedLevenshtein(a.toString, b.toString, t)

  /** String-input twin of [[boundedLevenshtein]] for typed kernels that
    * already hold decoded Strings (the UTF8String overload delegates
    * here). */
  def boundedLevenshtein(s: String, u: String, t: Int): Long = {
    val m = s.length
    val n = u.length
    if (math.abs(m - n) > t) return -1L
    if (m == 0) return if (n <= t) n.toLong else -1L
    if (n == 0) return if (m <= t) m.toLong else -1L
    val INF = Int.MaxValue / 2
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    java.util.Arrays.fill(prev, INF)
    var j = 0
    val j0 = math.min(n, t)
    while (j <= j0) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      java.util.Arrays.fill(cur, INF)
      val lo = math.max(1, i - t)
      val hi = math.min(n, i + t)
      cur(0) = if (i <= t) i else INF
      var best = INF
      var jj = lo
      while (jj <= hi) {
        val cost = if (s.charAt(i - 1) == u.charAt(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      if (best > t) return -1L // no cell in the band can recover
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    val d = prev(n)
    if (d <= t) d.toLong else -1L
  }
}
