package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** TopKBuffer must agree with the sort-based reference for any input,
  * any k, any insertion order, and under arbitrary merge splits —
  * including duplicate scores and duplicate (score, id) pairs
  * (tie-break: lower id wins). Deterministic randomized sweep. */
class TopKSpec extends AnyFunSuite {

  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  private def drain(b: TopKBuffer): Seq[(Double, Long)] =
    b.sortedIndices.map(i => (b.scores(i), b.ids(i))).toSeq

  private val rnd = new scala.util.Random(7)
  private def randomInput(n: Int): Seq[(Double, Long)] =
    // small ranges → many score ties and exact duplicates
    Seq.fill(n)((rnd.nextInt(11).toDouble - 5, rnd.nextInt(50).toLong))

  test("insert-all equals sort-take across sizes, ks, and tie patterns") {
    for (trial <- 0 until 300) {
      val xs = randomInput(rnd.nextInt(60))
      val k = 1 + rnd.nextInt(12)
      val b = new TopKBuffer(k)
      xs.foreach { case (s, id) => b.insert(s, id) }
      assert(drain(b) == reference(xs, k), s"trial $trial k=$k xs=$xs")
    }
  }

  test("merge of split buffers equals single-buffer insert") {
    for (trial <- 0 until 300) {
      val xs = randomInput(rnd.nextInt(60))
      val k = 1 + rnd.nextInt(12)
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1))
      val bl = new TopKBuffer(k)
      l.foreach { case (s, id) => bl.insert(s, id) }
      val br = new TopKBuffer(k)
      r.foreach { case (s, id) => br.insert(s, id) }
      var i = 0
      while (i < br.size) { bl.insert(br.scores(i), br.ids(i)); i += 1 }
      assert(drain(bl) == reference(xs, k), s"trial $trial k=$k xs=$xs")
    }
  }

  // ---- string-keyed variant: order `score desc, key asc`, payload rides ----

  import org.apache.spark.unsafe.types.UTF8String

  private def refStr(xs: Seq[(Long, String, Long)], k: Int): Seq[(Long, String, Long)] =
    xs.sortBy { case (s, key, _) => (-s, key) }.take(k)

  private def drainStr(b: TopKStrBuffer): Seq[(Long, String, Long)] =
    b.sortedIndices.map(i => (b.scores(i), b.keys(i).toString, b.payloads(i)(0))).toSeq

  private def randomStrInput(n: Int): Seq[(Long, String, Long)] =
    // small ranges → many score ties; payload = a recomputable tag
    Seq.fill(n) {
      val key = s"w${rnd.nextInt(40)}"
      (rnd.nextInt(7).toLong, key, key.length.toLong)
    }

  test("string-keyed insert-all equals sort-take (score desc, key asc) with payload intact") {
    for (trial <- 0 until 300) {
      val xs = randomStrInput(rnd.nextInt(60))
      val k = 1 + rnd.nextInt(12)
      val b = new TopKStrBuffer(k, 1)
      xs.foreach { case (s, key, p) =>
        b.insert(s, UTF8String.fromString(key), Array(p)) }
      assert(drainStr(b) == refStr(xs, k), s"trial $trial k=$k xs=$xs")
    }
  }

  test("string-keyed merge of split buffers equals single-buffer insert") {
    for (trial <- 0 until 300) {
      val xs = randomStrInput(rnd.nextInt(60))
      val k = 1 + rnd.nextInt(12)
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1))
      val bl = new TopKStrBuffer(k, 1)
      l.foreach { case (s, key, p) => bl.insert(s, UTF8String.fromString(key), Array(p)) }
      val br = new TopKStrBuffer(k, 1)
      r.foreach { case (s, key, p) => br.insert(s, UTF8String.fromString(key), Array(p)) }
      var i = 0
      while (i < br.size) { bl.insert(br.scores(i), br.keys(i), br.payloads(i)); i += 1 }
      assert(drainStr(bl) == refStr(xs, k), s"trial $trial k=$k xs=$xs")
    }
  }
}
