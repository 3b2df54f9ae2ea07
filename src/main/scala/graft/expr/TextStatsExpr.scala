package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All per-document text statistics in ONE compiled pass:
  * `struct<n_chars, n_tokens, n_bpeish, n_punct, n_alpha, hits>` where
  * `hits(i)` counts tokens in the i-th word list. Value-identical to the
  * `functions._` formulations it replaces (length / tokenCount /
  * regexp_extract_all counts / profileHits) — but those materialize an
  * array of EVERY matched character per row (a 5 KB doc allocates ~4 000
  * single-char strings just to count letters) and run interpreted
  * higher-order filters per word list. `wordLists` is a Seq (structural
  * equality), so identical stats columns in one projection are
  * deduplicated by codegen subexpression elimination. */
case class TextStats(child: Expression, wordLists: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_bpeish", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_token_count", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_stats expects string, got $other")
    }

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    wordLists.map { ws =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSets", sets, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.TextStats.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)

  override def prettyName: String = "text_stats"
}

object TextStats {

  /** Java-regex `\s` class (what `split(trim(text), "\\s+")` and the
    * bpeish `[^A-Za-z0-9\s]` pattern use). */
  @inline private def isRegexWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  def compute(text: UTF8String, sets: Array[java.util.HashSet[String]]): InternalRow = {
    val s = text.toString
    var nPunct = 0L
    var nAlpha = 0L
    var nBpe = 0L
    var prev = 0 // 0 = other/ws, 1 = alpha run, 2 = digit run
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) {
        nAlpha += 1
        if (prev != 1) nBpe += 1
        prev = 1
      } else if (cp >= '0' && cp <= '9') {
        if (prev != 2) nBpe += 1
        prev = 2
      } else {
        prev = 0
        if (!isRegexWs(cp)) {
          nBpe += 1
          if (cp == '.' || cp == ',' || cp == '!' || cp == '?' || cp == ';' || cp == ':')
            nPunct += 1
        }
      }
      i += Character.charCount(cp)
    }

    // identical to `when(length(trim(text))===0, 0).otherwise(size(split(trim(text),"\s+")))`
    val toks = TextHash.tokens(text)
    val nTokens =
      if (toks.length == 1 && toks(0).isEmpty) 0L else toks.length.toLong

    val hits = new Array[Long](sets.length)
    var nDistinct = 0L
    var maxCount = 0L
    if (nTokens > 0L) {
      // repetition stats (Gopher-style filters): distinct tokens and the
      // most frequent token's count, from one pass over the token array
      val counts = new java.util.HashMap[String, Long](toks.length * 2)
      var t = 0
      while (t < toks.length) {
        val tok = toks(t)
        var k = 0
        while (k < sets.length) {
          if (sets(k).contains(tok)) hits(k) += 1L
          k += 1
        }
        val c = counts.merge(tok, 1L, (a, b) => a + b)
        if (c > maxCount) maxCount = c
        t += 1
      }
      nDistinct = counts.size.toLong
    }
    InternalRow(text.numChars().toLong, nTokens, nBpe, nPunct, nAlpha,
      nDistinct, maxCount, new GenericArrayData(hits))
  }
}
