package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Plan-serialized BM25 scorer (the BpeEncoder pattern): all query
  * constants — the distinct term table, per-term quantized idf, each
  * query's term indexes, and the corpus length stats — precompute once at
  * plan time; each document then costs ONE tokenize pass + a hash lookup
  * per token + O(query terms) float ops, instead of one interpreted
  * array-`filter` scan per (query, term) that the Column formulation
  * paid.
  *
  * Arithmetic contract (must stay bit-identical with the SQL oracles and
  * the retired Column formulation): idf = round(ln(1 + (N − df + 0.5) /
  * (df + 0.5)) · 10⁶) with `StrictMath.log` — Spark's `log` evaluates
  * StrictMath.log (verified in the 4.1.2 bytecode), and the oracles pass
  * against DuckDB's ln under it; per-(doc, term) contribution =
  * round(idf · (tf·2.2 / (tf + 1.2·(0.25 + 0.75·(dl·N/T))))) with the
  * exact association the oracle spells; per-(doc, query) score = the
  * order-free long sum. Rounding is HALF_UP computed on the exact double
  * (floor + exact-fraction test) — `Math.round`'s floor(x+0.5) drifts on
  * ulp-edge values where Spark's BigDecimal HALF_UP and DuckDB's
  * std::round do not. */
final class Bm25Scorer(
    terms: Array[String],
    df: Array[Long],
    queryIds: Array[Long],
    queryTermIdx: Array[Array[Int]],
    nDocs: Long,
    totalTokens: Long) extends Serializable {

  private val nD = nDocs.toDouble
  private val tD = totalTokens.toDouble

  /** HALF_UP on the exact double value (positive domain): x − floor(x)
    * is exact for 0 ≤ x < 2⁵², so no x+0.5 rounding drift. */
  @inline private def roundHalfUp(x: Double): Long = {
    val f = Math.floor(x)
    (if (x - f >= 0.5) f + 1 else f).toLong
  }

  private val idfMicro: Array[Double] = df.map { d =>
    roundHalfUp(StrictMath.log(1.0 + (nD - d.toDouble + 0.5) / (d.toDouble + 0.5)) * 1e6).toDouble
  }

  @transient private lazy val termIndex: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](terms.length * 2)
    var i = 0
    while (i < terms.length) { m.put(terms(i), i); i += 1 }
    m
  }

  /** array<struct<q_id, score_q>> of this doc's positive query scores. */
  def score(text: UTF8String): GenericArrayData = {
    val toks = TextHash.tokens(text)
    val dl = if (toks.length == 1 && toks(0).isEmpty) 0 else toks.length
    val counts = new Array[Long](terms.length)
    var i = 0
    while (i < dl) {
      val idx = termIndex.get(toks(i))
      if (idx != null) counts(idx.intValue()) += 1
      i += 1
    }
    // 1.2·(0.25 + 0.75·(dl·N/T)) — hoisted: identical subtree per term
    val denomBase = 1.2 * (0.25 + 0.75 * (dl.toDouble * nD / tD))
    val out = new java.util.ArrayList[Any](queryIds.length)
    var q = 0
    while (q < queryIds.length) {
      val idxs = queryTermIdx(q)
      var score = 0L
      var j = 0
      while (j < idxs.length) {
        val tf = counts(idxs(j))
        if (tf > 0) {
          val tfD = tf.toDouble
          score += roundHalfUp(idfMicro(idxs(j)) * (tfD * 2.2 / (tfD + denomBase)))
        }
        j += 1
      }
      if (score > 0) out.add(InternalRow(queryIds(q), score))
      q += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object Bm25Scorer {
  /** Build from the [[graft.ops.Search]] call shape: queries with term
    * lists and a term → df map (absent terms df = 0). */
  def apply(queries: Seq[(Long, Seq[String])], df: Map[String, Long],
            nDocs: Long, totalTokens: Long): Bm25Scorer = {
    val terms = queries.flatMap(_._2).distinct.toArray
    val idx = terms.zipWithIndex.toMap
    new Bm25Scorer(
      terms,
      terms.map(t => df.getOrElse(t, 0L)),
      queries.map(_._1).toArray,
      queries.map(_._2.distinct.map(idx).toArray).toArray,
      nDocs, totalTokens)
  }
}

/** `bm25_scores(text)`: one compiled pass per document emitting every
  * positive (q_id, score_q) against the plan-frozen query set. */
case class Bm25Scores(child: Expression, scorer: Bm25Scorer) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q_id", LongType, nullable = false),
    StructField("score_q", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    scorer.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bm25Scorer", scorer, "graft.expr.Bm25Scorer")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Bm25Scores =
    copy(child = newChild)
  override def prettyName: String = "bm25_scores"
}
