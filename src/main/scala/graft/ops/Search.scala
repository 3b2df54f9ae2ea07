package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text retrieval over the indexed corpus: BM25 scoring and hybrid
  * lexical+vector rank fusion.
  *
  * The reference ships documents INTO a search engine (Solr) and leaves
  * query-time scoring to it (reference: hbase-indexer-engine's
  * SolrInputDocumentWriter hands docs to SolrJ, conf/schema.xml carries
  * the relevance config). A Spark-native engine keeps the serving side
  * too: the corpus IS the index, and a query plan is the scorer. The
  * shapes here are chosen for the 100-TB posture:
  *
  *  - Scoring is MAP-ONLY. Query terms and their document frequencies are
  *    plan literals (queries are human-sized; df comes from the standing
  *    index stats, not a per-query corpus agg), so a BM25 pass is one
  *    corpus scan with a compiled per-row expression — no explode, no
  *    (doc, term) shuffle, no join.
  *  - Top-k is the bounded-heap partial aggregate ([[graft.expr.TopKByScore]]):
  *    the exchange after the scan carries ≤ queries × k × tasks rows,
  *    never the scored corpus.
  *  - Scores are exact-integer micro-units (the t10/t11 convention): the
  *    only doubles are IEEE-deterministic single expressions (one ln per
  *    (term, df) pair quantized to the 10⁻⁶ grid; one tf-normalization
  *    ratio per (doc, term)), each rounded to a long before the order-free
  *    integer sum — so ranks are engine-portable and retry-stable.
  */
object Search {

  /** Whitespace tokens with the empty-text guard: empty/blank text is an
    * EMPTY array (split of "" would yield [""], minting a phantom term). */
  def toks(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** (nDocs, totalTokens) for the corpus — the BM25 length-normalization
    * stats. One agg; the collect is a single row (bounded by construction). */
  def corpusTokenStats(docs: DataFrame, textCol: String): (Long, Long) = {
    val r = docs.agg(
      count(lit(1)).as("n"),
      coalesce(sum(size(toks(col(textCol))).cast("long")), lit(0L)).as("t")).first()
    (r.getLong(0), r.getLong(1))
  }

  /** Global top-`k` vocabulary terms by (document frequency desc, term
    * asc). The df agg is the standard inverted-index build (one
    * explode → distinct → per-term count, all with map-side partials);
    * the global top-k is the bounded-heap STRING aggregate
    * ([[graft.expr.TopKByScoreStr]]), so no vocabulary-wide sort or
    * single-partition window ever runs. Driver collect is ≤ k rows.
    * Returns (term, df) strongest-first. */
  def topDfTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): Seq[(String, Long)] = {
    val df = docs
      .select(col(idCol).as("doc_id"), explode(array_distinct(toks(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    df.agg(graft.expr.hfunctions.topk_by_str(col("df"), col("term"), Seq(col("df")), k).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id"), element_at(col("t.vals"), 1))
      .collect() // bounded: ≤ k rows by the aggregate's contract
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Document frequency of an explicit term set (the index-build half of
    * BM25 serving: run once per corpus generation, not per query). One
    * map-only membership projection + a ≤ |terms| agg; the collect is
    * bounded by the query vocabulary. */
  def termDf(docs: DataFrame, textCol: String, terms: Seq[String]): Map[String, Long] = {
    require(terms.nonEmpty, "termDf: empty term set")
    val t = docs.select(explode(array_intersect(
      array_distinct(toks(col(textCol))),
      array(terms.map(lit): _*))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    t.collect() // bounded: ≤ |terms| rows
      .map(r => (r.getString(0), r.getLong(1))).toMap
  }

  /** BM25 top-k serving: for each (qId, terms) query, the k best documents
    * by quantized BM25 score (ties: smaller doc id). `df` maps each query
    * term to its document frequency in the standing index (terms absent
    * from the corpus score with df = 0 → idf = ln(1 + (N+0.5)/0.5), the
    * BM25+ no-evidence ceiling — they contribute only if a doc matches,
    * which for a truly absent term is never).
    *
    * Plan: ONE corpus scan. All query scores come from one eval of the
    * compiled [[graft.expr.Bm25Scores]] kernel per document (tokenize →
    * hash-count the plan-frozen term table → O(query terms) float ops);
    * positives explode to (q_id, score_q) rows and the per-query top-k is
    * the bounded-heap partial aggregate. Nothing corpus-sized ever
    * shuffles.
    *
    * Output: (q_id, doc_id, score_q, rk) strongest-first per query. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, Seq[String])], df: Map[String, Long],
               nDocs: Long, totalTokens: Long, k: Int,
               excludeSelf: Boolean = false): DataFrame = {
    val scored = bm25Scores(docs, idCol, textCol, queries, df, nDocs, totalTokens)
    val base = if (excludeSelf) scored.filter(col("doc_id") =!= col("q_id")) else scored
    base.groupBy(col("q_id"))
      // score_q is integer-valued and ≪ 2^53, so the double heap is exact
      .agg(graft.expr.hfunctions.topk_by(col("score_q").cast("double"), col("doc_id"), k).as("top"))
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t.n_id").as("doc_id"),
        col("t.sim").cast("long").as("score_q"), col("t.rk").as("rk"))
  }

  /** The scoring scan without the top-k: every (q_id, doc_id) pair with a
    * positive quantized BM25 score — the PERCOLATION shape (standing
    * queries, arriving documents) as well as bm25TopK's input. Map-only:
    * one pass over `docs` with every query's score a compiled per-row
    * expression, non-matching (score 0) pairs dropped at the scan. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 queries: Seq[(Long, Seq[String])], df: Map[String, Long],
                 nDocs: Long, totalTokens: Long): DataFrame = {
    require(queries.nonEmpty, "bm25Scores: no queries")
    require(nDocs > 0 && totalTokens > 0, "bm25Scores: empty corpus stats")
    queries.foreach { case (qId, terms) =>
      require(terms.nonEmpty, s"bm25Scores: query $qId has no terms") }
    val scorer = graft.expr.Bm25Scorer(queries, df, nDocs, totalTokens)
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(graft.expr.hfunctions.bm25_scores(col(textCol), scorer)).as("s"))
      .select(col("doc_id"), col("s.q_id").as("q_id"), col("s.score_q").as("score_q"))
  }

  /** Mid-frequency probe queries derived deterministically from the
    * corpus vocabulary: vocabulary ranks `skip+1 .. skip+nQueries*width`
    * by (df desc, term asc), chunked `width` terms per query in rank
    * order. Skipping the head keeps stopword-ish terms (df ≈ N, idf ≈ 0)
    * out of the probes. Returns (queries, df of every query term). */
  def deriveTermQueries(docs: DataFrame, idCol: String, textCol: String,
                        nQueries: Int, width: Int, skip: Int): (Seq[(Long, Seq[String])], Map[String, Long]) = {
    val top = topDfTerms(docs, idCol, textCol, skip + nQueries * width)
    val picked = top.drop(skip)
    require(picked.length == nQueries * width,
      s"deriveTermQueries: vocabulary too small (${top.length} ≤ $skip + ${nQueries * width})")
    val qs = picked.grouped(width).zipWithIndex
      .map { case (g, i) => (i.toLong, g.map(_._1)) }.toSeq
    (qs, picked.toMap)
  }

  /** Reciprocal-rank fusion of two per-query rank lists (the hybrid
    * lexical + vector serving shape): each system's vote for a doc is
    * round(10⁶ / (60 + rank)) micro-units (the standard RRF constant),
    * fused by exact integer sum, re-ranked (fused desc, doc asc), top-k
    * via the bounded heap. Inputs are already top-K′ lists — queries×K′
    * rows each — so every join here is broadcast-sized; nothing scales
    * with the corpus. Expected columns: (q_id, doc_id, rk). */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    def votes(df: DataFrame): DataFrame =
      df.select(col("q_id"), col("doc_id"),
        round(lit(1e6) / (lit(60.0) + col("rk").cast("double"))).cast("long").as("v"))
    val fused = votes(a).as("l")
      .join(votes(b).as("r"), Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        (coalesce(col("l.v"), lit(0L)) + coalesce(col("r.v"), lit(0L))).as("rrf_q"))
    fused.groupBy(col("q_id"))
      .agg(graft.expr.hfunctions.topk_by(col("rrf_q").cast("double"), col("doc_id"), k).as("top"))
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t.n_id").as("doc_id"),
        col("t.sim").cast("long").as("rrf_q"), col("t.rk").as("rk"))
  }

  case class MmrPick(q_id: Long, doc_id: Long, reln_q: Long, mmr_q: Long, rk: Long)

  /** HALF_UP away from zero on the exact double (both engines' round()
    * semantics; Math.round's floor(x+0.5) drifts on ulp-edge values). */
  private def roundAwayMicro(x: Double): Long = {
    def pos(v: Double): Long = {
      val f = Math.floor(v)
      (if (v - f >= 0.5) f + 1 else f).toLong
    }
    if (x >= 0) pos(x) else -pos(-x)
  }

  /** Maximal-marginal-relevance re-ranking of per-query candidate lists
    * (λ = 0.5, scaled ×2 into exact integers): step 1 takes the most
    * relevant candidate; each later step maximizes `relN − max sim to
    * the already-chosen` — the diversified serving step that stops a
    * result page from being five copies of the same document. Relevance
    * normalizes per query to [0, 10⁶]; similarity is micro-quantized
    * exact-integer cosine, so every selection is an integer argmax
    * (ties → smaller doc id) and the greedy trace is engine-portable —
    * the oracle replays it as k unrolled SQL stages.
    *
    * Input: (q_id, doc_id, score_q, q, nq) — a top-K′ list already, so
    * the groupBy exchange carries queries×K′ rows and the per-group
    * O(K′²·dim) sim table is arithmetic on in-memory arrays. Output:
    * (q_id, doc_id, reln_q, mmr_q, rk) with rk = 1..k selection order. */
  def mmrRerank(cands: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"mmrRerank: k must be positive: $k")
    val spark = cands.sparkSession
    import spark.implicits._
    cands.select(col("q_id").cast("long"), col("doc_id").cast("long"),
        col("score_q").cast("long"), col("q"), col("nq").cast("long"))
      .as[(Long, Long, Long, Seq[Long], Long)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cs = it.toArray.sortBy(_._2)
        if (cs.isEmpty) Iterator.empty
        else {
          val maxS = cs.map(_._3).max.toDouble
          val relN = cs.map(c => roundAwayMicro(c._3.toDouble * 1e6 / maxS))
          val vecs = cs.map(_._4.toArray)
          val nq = cs.map(_._5)
          def simQ(i: Int, j: Int): Long = {
            if (nq(i) == 0L || nq(j) == 0L) 0L
            else {
              var dot = 0L
              val a = vecs(i); val b = vecs(j)
              var d = 0
              while (d < a.length) { dot += a(d) * b(d); d += 1 }
              roundAwayMicro(dot.toDouble /
                (Math.sqrt(nq(i).toDouble) * Math.sqrt(nq(j).toDouble)) * 1e6)
            }
          }
          val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
          val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
          var rk = 1L
          while (chosen.length < math.min(k, cs.length)) {
            var best = -1
            var bestMmr = Long.MinValue
            var i = 0
            while (i < cs.length) {
              if (!chosen.contains(i)) {
                val pen = if (chosen.isEmpty) 0L else chosen.map(simQ(i, _)).max
                val mmr = relN(i) - pen
                // ties → smaller doc id (cs is doc-sorted, so first wins)
                if (mmr > bestMmr) { bestMmr = mmr; best = i }
              }
              i += 1
            }
            out += MmrPick(qid, cs(best)._2, relN(best), bestMmr, rk)
            chosen += best
            rk += 1
          }
          out.iterator
        }
      }
      .toDF()
  }

  /** The query-side term profile for query-by-document retrieval: the
    * first `width` DISTINCT tokens of each query document in position
    * order. Driver-bounded: queries are human-sized (the caller passes a
    * handful of probe docs), and each profile is ≤ width terms. */
  def docTermProfiles(docs: DataFrame, idCol: String, textCol: String,
                      width: Int): Seq[(Long, Seq[String])] = {
    val profiled = docs.select(col(idCol).cast("long").as("q_id"),
      slice(array_distinct(toks(col(textCol))), 1, width).as("terms"))
    profiled.collect() // bounded: |queries| rows, ≤ width terms each
      .map(r => (r.getLong(0), r.getSeq[String](1).toSeq))
      .filter(_._2.nonEmpty).sortBy(_._1)
  }
}
