package graft

/** Single-threaded cost comparison of compiled text kernels — the
  * number behind kernel-choice claims in SCALE.md/BENCHNOTES (the
  * per-window digest is the dominant per-byte cost of the char-granular
  * ExactSubstr operator; both kernels here produce identical cut
  * decisions, DedupSpec pins it). No Spark session: this measures the
  * kernel, not the plan. Usage: runMain graft.KernelProbe [k] [docs]. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(25)
    val nDocs = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val rnd = new scala.util.Random(7)
    val words = Vector("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "join", "window")
    val texts = (1 to nDocs).map(_ =>
      Seq.fill(180)(words(rnd.nextInt(words.size))).mkString(" "))
    def time(label: String)(f: String => Array[Long]): Unit = {
      texts.take(200).foreach(f) // warm
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); var n = 0L
        texts.foreach(t => n += f(t).length)
        println(f"[kernel] $label k=$k: ${(System.nanoTime() - t0) / 1e9}%.3fs ($n windows)")
      }
    }
    time("char_kgram_md5")(t => graft.expr.TextHash.charKgramHashes60(t, k))
    time("char_kgram_rolling")(t => graft.expr.TextHash.charKgramHashesRolling(t, k))
    time("token_kgram_md5")(t => graft.expr.TextHash.kgramHashes60(t, 8))
  }
}
