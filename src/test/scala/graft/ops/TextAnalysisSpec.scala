package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4 line cleaning + Gopher document rules: each predicate and each
  * bitmask bit trips on exactly its designed violation, and the
  * end-to-end gate composes them over multi-line documents. */
class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private def keptLines(text: String, minLineWords: Int = 3): List[String] =
    Seq(Tuple1(text)).toDF("text")
      .select(TextAnalysis.c4KeptLines(col("text"), minLineWords).as("k"))
      .collect().head.getSeq[String](0).toList

  test("c4KeptLines: terminal punctuation, min words, blacklist") {
    val text = Seq(
      "This line is long enough and ends well.",
      "short.",                        // under the word floor
      "no terminal punctuation here",  // no closing punctuation
      "Lorem Ipsum dolor sit amet.",   // blacklist, case-insensitive
      "function demo { return }",      // brace boilerplate
      "Is this a question? sure!",     // '!' terminates
      "He said \"stop\"").mkString("\n") // closing quote terminates
    assert(keptLines(text) == List(
      "This line is long enough and ends well.",
      "Is this a question? sure!",
      "He said \"stop\""))
  }

  test("c4KeptLines: empty and single-line docs") {
    assert(keptLines("") == Nil)
    assert(keptLines("One decent sentence stands alone.") ==
      List("One decent sentence stands alone."))
  }

  private def bits(t: String, minWords: Int = 5, maxWords: Int = 100): Long =
    Seq(Tuple1(t)).toDF("text")
      .select(TextAnalysis.gopherRuleBits(col("text"), minWords, maxWords).as("b"))
      .collect().head.getLong(0)

  test("gopherRuleBits: a healthy document passes every rule") {
    val good = "the cat sat on the mat and then the dog ran off to the park again"
    assert(bits(good) == 0L)
  }

  test("gopherRuleBits: each bit trips on its designed violation") {
    // bit 0: word count under the floor (stopwords present, mean len ok)
    assert((bits("the dog runs") & 1L) == 1L)
    // bit 1: mean word length below 3 (single-letter soup)
    assert((bits("a b c d e f g h i j") & 2L) == 2L)
    // bit 2: symbol-to-word ratio — '#' on every other word
    assert((bits("the # cat # sat # on # the # mat # again") & 4L) == 4L)
    // bit 3: > 90% bullet lines
    val bullets = (1 to 12).map(i => s"- item number $i in the listing").mkString("\n")
    assert((bits(bullets) & 8L) == 8L)
    // bit 4: > 30% ellipsis-terminated lines
    val trails = Seq("the thought trails away...",
      "and again it trails off...", "a plain closing line here").mkString("\n")
    assert((bits(trails) & 16L) == 16L)
    // bit 5: fewer than 80% alphabetic words
    assert((bits("1 2 3 4 5 the 7 8 9 10 11 12") & 32L) == 32L)
    // bit 6: fewer than 2 stopword hits
    assert((bits("purple elephants juggle quartz flasks beyond misty canyons") & 64L) == 64L)
  }

  test("c4GopherClean: line filter feeds the document gate end-to-end") {
    val df = Seq(
      (1L, "the cat sat on the mat and the dog ran to the park today.\nclick here\nthe value of a row in a table is the sum of its parts."),
      (2L, "menu { x }\njavascript required")).toDF("doc_id", "text")
    val out = TextAnalysis.c4GopherClean(df, "doc_id", "text",
        minLineWords = 3, minWords = 10, maxWords = 1000)
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_lines") == 3L && r1.getAs[Long]("n_kept") == 2L)
    assert(r1.getAs[String]("clean_text").split("\n").length == 2)
    assert(r1.getAs[Long]("rule_bits") == 0L && r1.getAs[Long]("gopher_pass") == 1L)
    val r2 = out(1)
    assert(r2.getAs[Long]("n_kept") == 0L && r2.getAs[String]("clean_text") == "")
    assert(r2.getAs[Long]("gopher_pass") == 0L,
      "an all-boilerplate page cleans to empty and fails the gate")
  }

  test("lineRepetition: duplicate occurrences beyond the first, char-weighted") {
    // 4 non-blank lines: "aa" ×2 (len 2), "bbbb" ×1, "cc dd" ×1
    // dup occurrences = 1; dup chars = 2; total chars = 2+2+4+5 = 13
    val df = Seq((1L, "aa\n aa \nbbbb\n\ncc dd")).toDF("doc_id", "text")
    val r = TextAnalysis.lineRepetition(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Long]("dup_line_ppm") == 1000000L / 4)
    assert(r.getAs[Long]("dup_line_char_ppm") == 2L * 1000000L / 13L)
  }

  test("paraRepetition: blank-line-separated blocks, duplicates beyond the first") {
    // paragraphs: "aa bb" x2 (len 5), "cc" x1 -> 3 paras, 1 dup,
    // chars 5+5+2 = 12, dup chars 5
    val df = Seq((1L, "aa bb\n\ncc\n\naa bb")).toDF("doc_id", "text")
    val r = TextAnalysis.paraRepetition(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_paras") == 3L)
    assert(r.getAs[Long]("dup_para_ppm") == 1000000L / 3)
    assert(r.getAs[Long]("dup_para_char_ppm") == 5L * 1000000L / 12L)
  }

  test("topNgramCharFrac: count x gram length of the most frequent 2-gram") {
    // normalized: "a b a b a b x" (13 chars); top 2-gram "a b" (len 3)
    // occurs 3x -> cov 9 -> 692307 ppm
    val df = Seq((1L, "a b a b a b x")).toDF("doc_id", "text")
    val r = TextAnalysis.topNgramCharFrac(df, "doc_id", "text", 2).collect().head
    assert(r.getAs[Long]("n_chars") == 13L)
    assert(r.getAs[Long]("top_ngram_char_ppm") == 9L * 1000000L / 13L)
  }

  test("dupNgramCharFrac: overlapping duplicated n-gram spans count chars once") {
    // "p q r s t u p q r s t u v" (25 chars): the repeated 6-token run
    // yields overlapping duplicated 5-grams [0,9),[2,11) and [12,21),
    // [14,23) -> union [0,11) + [12,23) = 22 chars
    val df = Seq((1L, "p q r s t u p q r s t u v")).toDF("doc_id", "text")
    val r = TextAnalysis.dupNgramCharFrac(df, "doc_id", "text", 5).collect().head
    assert(r.getAs[Long]("n_chars") == 25L)
    assert(r.getAs[Long]("dup_ngram_char_ppm") == 22L * 1000000L / 25L,
      s"got ${r.getAs[Long]("dup_ngram_char_ppm")}")
  }

  test("repetitionGate: clean text passes, degenerate text fails; blank is safe") {
    val df = Seq(
      (1L, "the quick brown fox jumps over one lazy dog near the old river bank today"),
      (2L, "spam spam spam spam spam spam spam spam spam spam"),
      (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionGate(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep_pass")).toMap
    assert(out(1L) == 1L, "varied prose must pass")
    assert(out(2L) == 0L, "a degenerate repeated-token doc must fail")
    assert(out(3L) == 1L, "a blank doc yields all-zero features (no crash)")
  }

  test("repetitionGate kernel == the composable relational forms, feature by feature") {
    import spark.implicits._
    // adversarial texts: planted dup lines/paras, repeated 5-gram runs
    // with overlap, whitespace noise, blanks, single tokens, ties
    val docs = Seq(
      (1L, "aa\n aa \nbbbb\n\ncc dd"),
      (2L, "a b a b a b x"),
      (3L, "p q r s t u p q r s t u v"),
      (4L, "the quick brown fox jumps over one lazy dog near the old river"),
      (5L, "spam spam spam spam spam spam spam spam spam spam"),
      (6L, "   "),
      (7L, "solo"),
      (8L, "x y\n\nx y\n\nz\n\nx y"),
      (9L, "one two\tthree   four\nfive six seven eight nine ten one two\tthree   four")
    ).toDF("doc_id", "text")
    val viaKernel = TextAnalysis.repetitionGate(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // relational reference, assembled exactly like the pre-kernel gate
    val base = docs.select(col("doc_id"))
    val rel = base
      .join(TextAnalysis.lineRepetition(docs, "doc_id", "text"), Seq("doc_id"), "left")
      .join(TextAnalysis.paraRepetition(docs, "doc_id", "text"), Seq("doc_id"), "left")
      .join(TextAnalysis.topNgramCharFrac(docs, "doc_id", "text", 2)
        .withColumnRenamed("top_ngram_char_ppm", "top2_char_ppm")
        .drop("n_chars"), Seq("doc_id"), "left")
      .join(TextAnalysis.dupNgramCharFrac(docs, "doc_id", "text", 5)
        .withColumnRenamed("dup_ngram_char_ppm", "dup5_char_ppm"), Seq("doc_id"), "left")
      .na.fill(0L)
      .select("doc_id", "n_lines", "dup_line_ppm", "dup_line_char_ppm",
        "n_paras", "dup_para_ppm", "dup_para_char_ppm",
        "top2_char_ppm", "n_chars", "dup5_char_ppm")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    rel.foreach { case (id, want) =>
      assert(viaKernel(id).dropRight(1) == want,
        s"doc $id: kernel ${viaKernel(id).dropRight(1)} != relational $want")
    }
  }

  test("repetition windows partition by doc — never a global exchange") {
    val df = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val plan = TextAnalysis.dupNgramCharFrac(df, "doc_id", "text", 5)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"every repetition window must partition by doc_id: ${windows.map(_.partitionSpec)}")
  }
}
