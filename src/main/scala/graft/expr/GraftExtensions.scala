package graft.expr

import org.apache.spark.sql.{GraftInterop, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Cast, ConcatWs, Conv, Expression, ExpressionInfo, LambdaFunction, Literal, Md5, Pmod, RegExpReplace, StringSplit, Substring, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.types.{BinaryType, IntegerType}

/** SQL surface for the engine's compiled kernels: register with
  * `spark.sql.extensions=graft.expr.GraftExtensions` (new sessions) or
  * `GraftExtensions.register(spark)` (a live one), then every kernel is
  * callable from `spark.sql` / SQL cells — e.g.
  * `SELECT long_dot(a, b)`, `SELECT topk_by(score, id, 5)`. The builders
  * delegate to the same Expressions the Scala `hfunctions` API uses, so
  * SQL and DataFrame callers get byte-identical semantics (and codegen). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  // Catalyst twins of the Column-composed hfunctions (a Column built from
  // functions._ wraps UNRESOLVED nodes that a function builder cannot
  // return — the analyzer does not convert column-node wrappers injected
  // mid-plan — so the SQL surface builds the same trees natively).

  /** == hfunctions.md5_shard (reference HashSharder.java:38-48) */
  private def md5ShardExpr(id: Expression, n: Int): Expression =
    Pmod(Cast(Conv(Substring(Md5(Cast(id, BinaryType)), Literal(1), Literal(4)),
      Literal(16), Literal(10)), IntegerType), Literal(n))

  private def keyEscape(c: Expression): Expression =
    RegExpReplace(c, Literal("-"), Literal("\\\\-"))

  /** == hfunctions.format_key */
  private def formatKeyExpr(comps: Seq[Expression]): Expression =
    ConcatWs(Literal("-") +: comps.map(keyEscape))

  /** == hfunctions.unformat_key */
  private def unformatKeyExpr(id: Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("gx"))
    ArrayTransform(
      StringSplit(id, Literal("(?<!\\\\)-"), Literal(-1)),
      LambdaFunction(RegExpReplace(x, Literal("\\\\-"), Literal("-")), Seq(x)))
  }

  /** Shape parameters (shard counts, signature sizes, window widths) are
    * plan-time constants everywhere in the engine; SQL callers pass them
    * as literals. */
  private def intLit(ex: Expression, fn: String): Int = ex match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(s"$fn: expected a literal integer argument, got $other")
  }

  private def strLit(ex: Expression, fn: String): String = ex match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case other =>
      throw new IllegalArgumentException(s"$fn: expected a literal string argument, got $other")
  }

  private def mkInfo(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.expr.hfunctions", null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** (name, info, builder) for every SQL-expressible kernel. `srp_codes`
    * and `text_stats` stay Scala-only: their coefficient-matrix /
    * word-list parameters are driver-materialized arrays with no natural
    * SQL literal form. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("long_dot", mkInfo("long_dot", "exact integer dot product of two array<bigint>"),
      (es: Seq[Expression]) => LongDotProduct(es(0), es(1))),
    ("md5_shard", mkInfo("md5_shard", "reference HashSharder routing: first 2 md5 bytes mod n"),
      (es: Seq[Expression]) => md5ShardExpr(es(0), intLit(es(1), "md5_shard"))),
    ("hbase_decode", mkInfo("hbase_decode", "decode HBase big-endian bytes to a typed value"),
      (es: Seq[Expression]) => HBaseDecode(es(0), strLit(es(1), "hbase_decode"))),
    ("hbase_encode", mkInfo("hbase_encode", "encode a typed value to HBase big-endian bytes"),
      (es: Seq[Expression]) => HBaseEncode(es(0), strLit(es(1), "hbase_encode"))),
    ("shingle_hashes60", mkInfo("shingle_hashes60", "distinct 60-bit md5 hashes of word n-grams"),
      (es: Seq[Expression]) => ShingleHashes60(es(0), intLit(es(1), "shingle_hashes60"))),
    ("minhash_sig", mkInfo("minhash_sig", "k-permutation minhash signature of a hash array"),
      (es: Seq[Expression]) => MinHashSig(es(0), intLit(es(1), "minhash_sig"))),
    ("simhash", mkInfo("simhash", "simhash fingerprint of text"),
      (es: Seq[Expression]) => SimHash(es(0), intLit(es(1), "simhash"))),
    ("kgram_hashes60", mkInfo("kgram_hashes60", "positional 60-bit md5 hashes of word k-grams"),
      (es: Seq[Expression]) => KgramHashes60(es(0), intLit(es(1), "kgram_hashes60"))),
    ("remove_token_spans", mkInfo("remove_token_spans",
      "drop tokens covered by k-token windows at the given 1-based starts"),
      (es: Seq[Expression]) => RemoveTokenSpans(es(0), es(1),
        intLit(es(2), "remove_token_spans"))),
    ("char_kgram_hashes60", mkInfo("char_kgram_hashes60",
      "positional 60-bit md5 hashes of char k-grams over ws-normalized text"),
      (es: Seq[Expression]) => CharKgramHashes60(es(0), intLit(es(1), "char_kgram_hashes60"))),
    ("char_kgram_hashes_rolling", mkInfo("char_kgram_hashes_rolling",
      "positional rolling-polynomial hashes of char k-grams (O(len) scale kernel)"),
      (es: Seq[Expression]) => CharKgramHashesRolling(es(0), intLit(es(1), "char_kgram_hashes_rolling"))),
    ("remove_char_spans", mkInfo("remove_char_spans",
      "drop chars covered by k-char windows at the given 1-based starts"),
      (es: Seq[Expression]) => RemoveCharSpans(es(0), es(1),
        intLit(es(2), "remove_char_spans"))),
    ("merge_window_runs", mkInfo("merge_window_runs",
      "merge k-token window starts into maximal (start, end) runs"),
      (es: Seq[Expression]) => MergeWindowRuns(es(0), intLit(es(1), "merge_window_runs"))),
    ("winnow_hashes", mkInfo("winnow_hashes", "winnowing fingerprint hashes of text"),
      (es: Seq[Expression]) => WinnowHashes(es(0), intLit(es(1), "winnow_hashes"),
        intLit(es(2), "winnow_hashes"))),
    ("pack_codes", mkInfo("pack_codes", "pack an array of small codes into one 64-bit word"),
      (es: Seq[Expression]) => LongArrayPack(es(0), intLit(es(1), "pack_codes"))),
    ("packed_first_eq", mkInfo("packed_first_eq", "first bit-group where two packed words agree"),
      (es: Seq[Expression]) => PackedFirstEq(es(0), es(1), intLit(es(2), "packed_first_eq"))),
    ("topk_by", mkInfo("topk_by", "bounded-heap top-k (score, id) aggregate"),
      (es: Seq[Expression]) => TopKByScore(es(0), es(1), intLit(es(2), "topk_by"))),
    ("topk_by_str", mkInfo("topk_by_str",
      "string-keyed bounded-heap top-k aggregate with long payload columns"),
      (es: Seq[Expression]) => TopKByScoreStr(es(0), es(1), es.drop(2).dropRight(1),
        intLit(es.last, "topk_by_str"))),
    ("kmv_sketch", mkInfo("kmv_sketch",
      "K-minimum-values distinct-count synopsis: ascending k smallest distinct hashes"),
      (es: Seq[Expression]) => KmvSketch(es(0), intLit(es(1), "kmv_sketch"))),
    ("bounded_levenshtein", mkInfo("bounded_levenshtein",
      "Ukkonen-banded edit distance: exact when <= maxDist, else -1"),
      (es: Seq[Expression]) => BoundedLevenshtein(es(0), es(1),
        intLit(es(2), "bounded_levenshtein"))),
    ("char_shingles60", mkInfo("char_shingles60",
      "distinct 60-bit md5 hashes of all k-character substrings"),
      (es: Seq[Expression]) => CharShingles60(es(0), intLit(es(1), "char_shingles60"))),
    ("format_key", mkInfo("format_key", "reference string unique-key formatter (hyphen escaping)"),
      (es: Seq[Expression]) => formatKeyExpr(es)),
    ("unformat_key", mkInfo("unformat_key", "split a formatted unique key into components"),
      (es: Seq[Expression]) => unformatKeyExpr(es(0))))

  /** Register every function on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      GraftInterop.registerFunction(spark, name, info, builder)
    }
}
