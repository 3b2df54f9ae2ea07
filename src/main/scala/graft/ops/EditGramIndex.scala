package graft.ops

/** Driver-built inverted index over the SMALL side of an edit-level
  * contamination / admission check: for each distinct char-k-gram hash of
  * the reference texts (a decontamination benchmark, or a crawl
  * increment), the postings list of reference documents containing it,
  * plus the per-reference gram-set size and text needed by the overlap
  * bar and the bounded-DP verify.
  *
  * This is the kernel replacement for the relational
  * `explode(grams) → broadcast join → groupBy(doc, ref) count` candidacy
  * plan: one binary search per corpus gram replaces a ~(text-len)× row
  * explode and a hit-row shuffle. The small side is bounded by the SAME
  * contract that let the relational plan `broadcast()` it — a benchmark
  * or increment measured in MBs — so holding it on the driver and
  * broadcasting the packed arrays is the identical memory class with
  * none of the join machinery. At 100 TB the corpus side stays a
  * map-only scan: zero shuffles, zero explode, candidate verification
  * inline in the same pass.
  *
  * Layout: `uniq` is the sorted distinct gram-hash array; gram `uniq(i)`
  * owns postings `postings(offsets(i) until offsets(i+1))`, each entry a
  * reference ordinal into `ids` / `gramCounts` / `texts`.
  */
final class EditGramIndex private (
    private val uniq: Array[Long],
    private val offsets: Array[Int],
    private val postings: Array[Int],
    val ids: Array[Long],
    val gramCounts: Array[Long],
    val texts: Array[String]) extends Serializable {

  def nRefs: Int = ids.length
  def nGrams: Int = uniq.length

  /** Accumulate one document's distinct gram hashes into per-reference
    * hit counts: every reference sharing ≥1 gram is recorded once in
    * `touched` and its shared-distinct-gram count lands in `hitCounts`.
    * Returns the touched count. The caller owns the scratch arrays
    * (sized ≥ [[nRefs]]) and must zero the touched `hitCounts` slots
    * before the next probe — reuse keeps the per-doc cost allocation-free. */
  def probe(grams: Array[Long], hitCounts: Array[Int], touched: Array[Int]): Int = {
    var t = 0
    var gi = 0
    while (gi < grams.length) {
      val pos = java.util.Arrays.binarySearch(uniq, grams(gi))
      if (pos >= 0) {
        var p = offsets(pos)
        val end = offsets(pos + 1)
        while (p < end) {
          val r = postings(p)
          if (hitCounts(r) == 0) { touched(t) = r; t += 1 }
          hitCounts(r) += 1
          p += 1
        }
      }
      gi += 1
    }
    t
  }
}

object EditGramIndex {

  /** Build from `(id, text, distinct gram hashes)` reference rows —
    * typically the collected output of `Dedup.editBenchPrep` (rows with
    * empty gram sets are excluded there, matching the relational plan's
    * `size(hs) > 0` filter; rows reaching here with zero grams can never
    * be touched by a probe and are carried harmlessly). */
  def build(refs: Array[(Long, String, Array[Long])]): EditGramIndex = {
    val n = refs.length
    val ids = new Array[Long](n)
    val texts = new Array[String](n)
    val gramCounts = new Array[Long](n)
    var total = 0
    var i = 0
    while (i < n) {
      ids(i) = refs(i)._1
      texts(i) = refs(i)._2
      gramCounts(i) = refs(i)._3.length.toLong
      total += refs(i)._3.length
      i += 1
    }
    // (gram, ref) postings sorted by gram hash; grams are distinct per
    // ref, so each (gram, ref) pair appears exactly once
    val pairs = new Array[(Long, Int)](total)
    var p = 0
    i = 0
    while (i < n) {
      val hs = refs(i)._3
      var j = 0
      while (j < hs.length) { pairs(p) = (hs(j), i); p += 1; j += 1 }
      i += 1
    }
    scala.util.Sorting.stableSort(pairs, (a: (Long, Int), b: (Long, Int)) => a._1 < b._1)
    var distinct = 0
    i = 0
    while (i < total) {
      if (i == 0 || pairs(i)._1 != pairs(i - 1)._1) distinct += 1
      i += 1
    }
    val uniq = new Array[Long](distinct)
    val offsets = new Array[Int](distinct + 1)
    val postings = new Array[Int](total)
    var u = -1
    i = 0
    while (i < total) {
      if (i == 0 || pairs(i)._1 != pairs(i - 1)._1) {
        u += 1
        uniq(u) = pairs(i)._1
        offsets(u) = i
      }
      postings(i) = pairs(i)._2
      i += 1
    }
    offsets(distinct) = total
    new EditGramIndex(uniq, offsets, postings, ids, gramCounts, texts)
  }
}
