package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistical scoring: operators whose per-document output
  * depends on *global* corpus statistics (n-gram counts, document
  * frequencies) — the "train a tiny model on the corpus, score every doc
  * with it" family that sits between the pure projections in
  * [[TextAnalysis]] and the pair-finding operators in [[Dedup]].
  *
  * Scale design (100 TB):
  *  - everything derives from ONE per-(doc, key) pre-aggregation, so the
  *    wide explode output is collapsed map-side before any data crosses
  *    the network;
  *  - global count tables (the "model") are plain shuffle aggregations on
  *    uniform-ish keys; Zipf skew on common words collapses map-side in
  *    the partial aggregate, so the reduce-side key width is bounded by
  *    the distinct vocabulary per partition;
  *  - score join-backs are shuffle joins keyed on the n-gram / term — at
  *    100 TB the model table is itself large (no broadcast), and the join
  *    is exactly the "probe the LM" step; vocabulary pruning (min-count)
  *    shrinks it when the tail is irrelevant;
  *  - no floating-point value ever drives a RANKING directly: TF-IDF
  *    ranks on a quantized integer score, so two engines whose `ln`
  *    differs in the last ulp still produce the identical top-k.
  */
object CorpusStats {

  /** Per-document bigram counts (doc_id, w1, w2, m): the shared base of
    * the LM operators. One explode, then an immediate per-(doc, bigram)
    * aggregation — the only stage that ever sees one row per token
    * occurrence, and it collapses map-side. Documents with fewer than two
    * tokens have no bigrams and drop out at the scan. */
  private[ops] def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // kernelParallel: the tokenize+explode+partial-agg stage is the LM
    // family's CPU wall and a small input arrives as 1-2 splits (the
    // Dedup.shingleHashSets rationale; zero shuffle at scale). The
    // compiled token_ngrams kernel replaces the interpreted
    // transform(sequence(...)) HOF chain — <2-token texts yield an
    // empty array, so no size() guard is needed
    Dedup.kernelParallel(docs.filter(length(trim(col(textCol))) > 0))
      .select(col(idCol).as("doc_id"),
        explode(graft.expr.hfunctions.token_ngrams(col(textCol), 2)).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // explicit no-op null guard (split() tokens are never null) so every
      // consumer branch carries the isnotnull constraints the optimizer
      // would otherwise INFER from its own join keys and push down
      // asymmetrically — canonical-distinct copies of this subtree each
      // rematerialize the exchange (the t21 profile showed the
      // tokenize+explode+agg stage executing once PER marginal); with the
      // constraint pre-seeded, all copies canonicalize equal and AQE
      // materializes the gram aggregate once (the kernelParallel
      // hash-key/reuse discipline)
      .filter(col("w1").isNotNull && col("w2").isNotNull)
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
  }

  /** Corpus bigram language-model score per document — the CCNet-style
    * "LM quality filter": train a bigram LM on the corpus itself, score
    * each document by its mean token-transition log-probability
    * `avg over bigram occurrences of ln( c(w1 w2) / c(w1 ·) )`, where
    * `c(w1 ·)` counts w1 as a bigram PREFIX (so probabilities condition
    * on "a next token exists" and sum to 1 per prefix). Boilerplate and
    * in-distribution text scores high (near 0); token soup scores low
    * (large negative). No smoothing is needed: every scored bigram came
    * from the corpus, so its count is ≥ 1.
    *
    * Output: (doc_id, n_bigrams, avg_logp), one row per document with ≥ 2
    * tokens.
    *
    * Each bigram's log-prob is QUANTIZED to the 10⁻⁶ grid before the
    * per-doc sum: a float sum's value depends on accumulation order, so
    * two engines (or two partitionings) can disagree in the last ulp —
    * at sf0.1 that flipped the sort order of two equal-scored documents.
    * Summing the quantized values as exact integers is order-free, and
    * the single final division of two exact integers is correctly
    * rounded, hence bit-identical everywhere (the t11 rank-key
    * convention applied to a mean).
    *
    * Plan shape: docBigrams (1 shuffle) → two count aggregations over it
    * (the "model"; 2 shuffles) → two probe joins keyed on the bigram /
    * prefix → per-doc weighted average (1 shuffle). The per-doc rows
    * carry multiplicity `m`, so the probe traffic is distinct-bigrams-
    * per-doc, not tokens. */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val db = docBigrams(docs, idCol, textCol)
    // Marginalize the VOCABULARY table, not the doc-bigram stream: c_ug
    // summed from c_bg is the same long (both marginalize the same
    // occurrence stream), but the input is distinct-bigram-sized instead
    // of doc×bigram-sized — and the model (c_bg, c_ug per bigram) joins
    // to the probe stream ONCE instead of once per marginal. At 100 TB
    // the probe stream is the corpus; each avoided join over it is a
    // full-stream shuffle saved when the vocabulary outgrows broadcast.
    val bgc = db.groupBy("w1", "w2").agg(sum("m").as("c_bg"))
    val ugc = bgc.groupBy("w1").agg(sum("c_bg").as("c_ug"))
    val qLogP = round(log(col("c_bg").cast("double") / col("c_ug")) * 1e6)
      .cast("long")
    val model = bgc.join(ugc, Seq("w1")).select(col("w1"), col("w2"), qLogP.as("lp"))
    db.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum("m").as("n_bigrams"),
        (sum(col("m") * col("lp")).cast("double") / (sum("m") * lit(1e6)))
          .as("avg_logp"))
  }

  /** Per-document trigram counts (doc_id, w1, w2, w3, m) — the trigram
    * analog of [[docBigrams]]; ≥3-token documents only. */
  private[ops] def docTrigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // kernelParallel + compiled token_ngrams: same rationale as docBigrams
    Dedup.kernelParallel(docs.filter(length(trim(col(textCol))) > 0))
      .select(col(idCol).as("doc_id"),
        explode(graft.expr.hfunctions.token_ngrams(col(textCol), 3)).as("tg"))
      .select(col("doc_id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))
      // no-op null guard for canonical equality across consumer branches —
      // see docBigrams; t21's five marginals each fork this subtree
      .filter(col("w1").isNotNull && col("w2").isNotNull && col("w3").isNotNull)
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("m"))
  }

  /** Interpolated TRIGRAM language-model score per document — [[bigramLmScore]]
    * with one more order and Jelinek–Mercer backoff, the KenLM-shaped
    * quality filter: per trigram occurrence
    * `p = 0.6·c(w1w2w3)/c(w1w2·) + 0.3·c(w2w3·)/c(w2··) + 0.1·c(w3)/C`,
    * where EVERY count marginalizes the SAME trigram-occurrence stream
    * (the event space is "trigram positions", so each backoff
    * distribution sums to 1 over its conditioning and every scored item
    * has count ≥ 1 — no smoothing constant to tune). Score = mean
    * quantized ln p over the doc's trigram occurrences.
    *
    * Same portability discipline as t10: each ln is quantized to the
    * 10⁻⁶ grid BEFORE the per-doc sum (order-free exact-integer mean);
    * the interpolation itself is a fixed left-to-right double expression
    * shape shared with the oracle.
    *
    * Plan shape: docTrigrams (1 shuffle) → four marginal aggregations
    * over it + the scalar total (broadcast 1-row cross join, never a
    * driver collect) → probe joins keyed on the marginals → per-doc
    * weighted mean. Probe traffic is distinct-trigrams-per-doc, not
    * tokens. Output: (doc_id, n_trigrams, avg_logp). */
  def trigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dt = docTrigrams(docs, idCol, textCol)
    // Every backoff count marginalizes the SAME trigram-occurrence
    // stream, so each is equally a sum over the distinct-trigram count
    // table: derive tgp/bgc/bgp/ugc/tot from tgc (vocabulary-sized
    // inputs — long sums are order-free exact, values identical), stitch
    // the per-trigram log-prob into ONE model table with vocab×vocab
    // joins, and probe the doc-trigram stream ONCE. The previous shape
    // re-aggregated the full doc×trigram stream per marginal (the static
    // plan re-executed the scan+explode 6×) and chained five probe joins
    // over the corpus-sized stream — five full-stream shuffles at the
    // scale where the vocabulary no longer broadcasts.
    val tgc = dt.groupBy("w1", "w2", "w3").agg(sum("m").as("c_tg"))
    val tgp = tgc.groupBy("w1", "w2").agg(sum("c_tg").as("c_tgp"))
    val bgc = tgc.groupBy("w2", "w3").agg(sum("c_tg").as("c_bg"))
    val bgp = bgc.groupBy("w2").agg(sum("c_bg").as("c_bgp"))
    val ugc = tgc.groupBy("w3").agg(sum("c_tg").as("c_ug"))
    val tot = tgc.agg(sum("c_tg").as("c_all"))
    val p = lit(0.6) * (col("c_tg").cast("double") / col("c_tgp")) +
      lit(0.3) * (col("c_bg").cast("double") / col("c_bgp")) +
      lit(0.1) * (col("c_ug").cast("double") / col("c_all"))
    val qLogP = round(log(p) * 1e6).cast("long")
    val model = tgc
      .join(tgp, Seq("w1", "w2"))
      .join(bgc, Seq("w2", "w3"))
      .join(bgp, Seq("w2"))
      .join(ugc, Seq("w3"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("w3"), qLogP.as("lp"))
    dt.join(model, Seq("w1", "w2", "w3"))
      .groupBy("doc_id")
      .agg(sum("m").as("n_trigrams"),
        (sum(col("m") * col("lp")).cast("double") / (sum("m") * lit(1e6)))
          .as("avg_logp"))
  }

  /** Per-document top-k TF-IDF terms — keyword extraction over the whole
    * corpus. score = tf · ln(N / df) with tf the in-doc term count, df
    * the number of documents containing the term, N the corpus size.
    *
    * The ranking key is `round(score · 10⁶)` as an INTEGER: `ln` is not
    * exactly rounded and two mathematically equal scores computed
    * differently (e.g. 2·ln(10) vs ln(100)) can differ in the last ulp —
    * per-engine — so ranking raw doubles is not portable; the quantized
    * key + term-string tie-break is. Output: (doc_id, term, tf, df, rk),
    * floats never surface.
    *
    * Plan shape: explode → per-(doc, term) count (1 shuffle; map-side
    * collapse bounds Zipf skew) → df aggregation over it (1 shuffle) →
    * probe join on the term → per-doc top-k via the string-keyed
    * bounded-heap aggregate ([[graft.expr.TopKByScoreStr]]): partial
    * heaps collapse map-side, so the final exchange carries ≤ docs×k
    * entries and no per-group sort ever runs — the `row_number` window
    * this replaces shuffled and sorted the FULL (doc, term) score table.
    * The heap key is the term itself (tie-break `score desc, term asc`,
    * identical to the window's ordering) and (tf, df) ride as payload,
    * so no hash indirection and no join-back. N rides in as a broadcast
    * 1-row cross join, never a driver collect. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 5): DataFrame = {
    val nonEmpty = docs.filter(length(trim(col(textCol))) > 0)
    val tf = nonEmpty
      .select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = nonEmpty.agg(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("w"))
      .crossJoin(broadcast(n))
      .withColumn("score_q",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")) * 1e6)
          .cast("long"))
      .groupBy("doc_id")
      .agg(graft.expr.hfunctions.topk_by_str(
        col("score_q"), col("w"), Seq(col("tf"), col("df")), k).as("top"))
      .select(col("doc_id"), explode(col("top")).as("t"))
      .select(col("doc_id"), col("t.id").as("term"),
        element_at(col("t.vals"), 1).as("tf"),
        element_at(col("t.vals"), 2).as("df"),
        col("t.rk").as("rk"))
  }

  /** Model-based quality classifier — the DCLM/fastText-style "train a
    * tiny text classifier on a labeled seed, score the whole corpus"
    * curation step, in multinomial Naive-Bayes form so every number the
    * model produces is engine-portable exact arithmetic.
    *
    * `seedLabels` is (doc_id, lab boolean): the caller's curated
    * positives (lab = true; e.g. docs from a trusted source) and sampled
    * negatives (lab = false; e.g. a deterministic hash-sample of the
    * crawl) — exactly how the DCLM/CCNet quality filters source their
    * training sets. The model is per-token Laplace-smoothed class
    * likelihoods over the seed tokens; every document then scores
    *
    *   score = ln(Npos/Nneg) + Σ_tokens [ln P(w|pos) − ln P(w|neg)]
    *
    * with each per-token log-likelihood QUANTIZED to the 10⁻⁶ grid
    * (t10's convention) so the per-doc sum is an order-free exact
    * integer sum: `score_q` is that integer total and `pred` its sign —
    * no float accumulation, no cross-engine ulp drift. Tokens absent
    * from a class's seed take that class's Laplace "unseen" likelihood
    * 1/(T_class + V); tokens absent from BOTH classes still contribute
    * the (nonzero) difference of the two unseen constants, which is the
    * honest NB treatment when the class corpora differ in size.
    *
    * Output: (doc_id, n_tokens, score_q, pred) — one row per document
    * with ≥ 1 token.
    *
    * Plan shape (100 TB posture): one explode collapsed map-side into
    * per-(doc, w) counts (1 shuffle — shared shape with t10/t11); the
    * model is a (w)-keyed aggregation of the SEED subset only (seed-
    * sized, 1 shuffle); scalars (T_pos, T_neg, V, priors) ride as two
    * broadcast 1-row cross joins, never a driver collect; scoring is one
    * probe join on w (the model is vocabulary-sized — at 100 TB a
    * shuffle join whose Zipf head collapses map-side, same posture as
    * the t10 LM probe) and one per-doc sum (1 shuffle). */
  def nbQualityScore(docs: DataFrame, idCol: String, textCol: String,
                     seedLabels: DataFrame): DataFrame = {
    val (model, consts) = nbTrain(docs, idCol, textCol, seedLabels)
    nbScore(docs, idCol, textCol, model, consts)
  }

  /** Per-(doc, w) token counts — the shared base of train and score. */
  private def nbTf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("m"))

  /** Train the NB model once: returns (model, consts) where `model` is
    * (w, lpq, lnq) — the 10⁻⁶-grid quantized class log-likelihood per
    * seed-vocabulary token — and `consts` is one row (upos, uneg,
    * prior_q): the two Laplace "unseen" likelihoods and the class prior.
    * Freeze both (persist / write to parquet) to score later increments
    * or streams against a FIXED model — retraining per batch would make
    * admission decisions drift with arrival order. */
  def nbTrain(docs: DataFrame, idCol: String, textCol: String,
              seedLabels: DataFrame): (DataFrame, DataFrame) = {
    val counts = nbTf(docs, idCol, textCol).join(seedLabels, Seq("doc_id"))
      .groupBy("w").agg(
        sum(when(col("lab"), col("m")).otherwise(0L)).as("cpos"),
        sum(when(!col("lab"), col("m")).otherwise(0L)).as("cneg"))
    val scal = counts.agg(sum("cpos").as("tpos"), sum("cneg").as("tneg"),
      count(lit(1)).as("v"))
    val pri = seedLabels.agg(
      sum(when(col("lab"), 1L).otherwise(0L)).as("npos"),
      sum(when(!col("lab"), 1L).otherwise(0L)).as("nneg"))
    // 10⁻⁶-grid quantized log-likelihood: identical expression shape on
    // the oracle side, so the (correctly-rounded) double division feeds
    // ln the same argument bit-for-bit
    def q(x: Column): Column = round(log(x) * 1e6).cast("long")
    val model = counts.crossJoin(broadcast(scal)).select(col("w"),
      q((col("cpos") + 1).cast("double") / (col("tpos") + col("v"))).as("lpq"),
      q((col("cneg") + 1).cast("double") / (col("tneg") + col("v"))).as("lnq"))
    val consts = scal.crossJoin(pri).select(
      q(lit(1.0) / (col("tpos") + col("v"))).as("upos"),
      q(lit(1.0) / (col("tneg") + col("v"))).as("uneg"),
      q(col("npos").cast("double") / col("nneg")).as("prior_q"))
    (model, consts)
  }

  /** Score documents against a trained (model, consts) pair. With
    * `broadcastProbe` the VOCAB-sized model never shuffles on the scored
    * side's trigger: the model streams map-side against the broadcast
    * batch vocabulary and only the trigger-sized hits re-broadcast into
    * the probe join — the shape a per-micro-batch streaming gate needs
    * (the [[graft.streaming]] increment-bounded-broadcast pattern).
    * Batch scoring of a full corpus keeps the default vocabulary-keyed
    * shuffle join. */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, consts: DataFrame,
              broadcastProbe: Boolean = false): DataFrame = {
    val tf = nbTf(docs, idCol, textCol)
    val probe =
      if (!broadcastProbe) tf.join(model, Seq("w"), "left")
      else {
        val hit = model.join(broadcast(tf.select("w").distinct()), Seq("w"))
        tf.join(broadcast(hit), Seq("w"), "left")
      }
    probe
      .crossJoin(broadcast(consts))
      .withColumn("contrib",
        col("m") * (coalesce(col("lpq"), col("upos")) -
          coalesce(col("lnq"), col("uneg"))))
      .groupBy("doc_id")
      .agg(sum("m").as("n_tokens"), sum("contrib").as("diff"),
        first("prior_q").as("_p"))
      .select(col("doc_id"), col("n_tokens"),
        (col("diff") + col("_p")).as("score_q"),
        (col("diff") + col("_p") > 0).as("pred"))
  }

  /** QUALITY-vs-QUANTITY frontier — the operating curve a filtering
    * threshold is chosen from: for every observed quality band, how many
    * documents and tokens survive a "keep ≥ this band" gate, and what
    * share of the corpus that is. Reading the curve answers "what does
    * each extra point of quality COST in tokens" before anyone commits
    * to a threshold (the number t31's calibration then validates).
    *
    * Per-doc quality quantizes to the 1e-6 grid (the p34 convention) and
    * docs bucket into fixed `bandWidth` bands — so the frontier is a
    * bands-sized SUFFIX CUMSUM over one census: one corpus scan + one
    * bands-keyed aggregate; the windows sit above the aggregate (the p33
    * discipline). Output: (threshold_q, n_kept, tokens_kept, share_ppm)
    * per observed band. */
  def qualityFrontier(docs: DataFrame, textCol: String,
                      bandWidth: Long = 100000L): DataFrame = {
    val bands = docs.select(
        round(TextAnalysis.qualityScore(col(textCol)) * 1e6).cast("long").as("q_q"),
        TextAnalysis.tokenCount(col(textCol)).as("tok"))
      .select(expr(s"q_q div ${bandWidth}L").as("band"), col("tok"))
      .groupBy(col("band")).agg(count(lit(1)).as("n"), sum(col("tok")).as("toks"))
    val w = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bands
      .withColumn("n_kept", sum(col("n")).over(w))
      .withColumn("tokens_kept", sum(col("toks")).over(w))
      .crossJoin(broadcast(bands.agg(sum(col("toks")).as("tot"))))
      .select((col("band") * lit(bandWidth)).as("threshold_q"),
        col("n_kept"), col("tokens_kept"),
        expr("CASE WHEN tot = 0 THEN 0L ELSE (tokens_kept * 1000000L) div tot END")
          .as("share_ppm"))
  }

  /** GOOD-TURING missing mass per group: the probability that the NEXT
    * token drawn from a source is a type never seen before, estimated by
    * the singleton share P₀ ≈ n₁/N — the coverage health-check a corpus
    * census runs before trusting per-source statistics (a source with
    * 30% missing mass is under-sampled; its quality numbers are noise).
    * Integer ppm output (truncating div — nonneg, engine-portable).
    *
    * Scale shape: one (group, term) aggregate with map-side partials
    * (the only stage that sees token occurrences), then a groups-sized
    * rollup. Join-free. Output: (grp, n_tokens, n_types, n_singletons,
    * p0_ppm). */
  def missingMass(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(groupCol).as("grp"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .groupBy(col("grp"), col("w")).agg(count(lit(1)).as("m"))
      .groupBy(col("grp"))
      .agg(sum(col("m")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("m") === 1L, lit(1L)).otherwise(lit(0L))).as("n_singletons"))
      .withColumn("p0_ppm", expr("(n_singletons * 1000000L) div n_tokens"))

  /** EXCESS-LOSS mixture reweighting (the DoReMi idea on the engine's
    * own t10 signal): per-source bigram-LM loss vs the global loss, and
    * a mixture weight ∝ the positive excess — sources the corpus LM
    * models WORST get upweighted, the domain-reweighting prior a
    * mixture is trained under. All integer:
    *  - per-(source, bigram) counts feed the global model (c_bg/c_ug)
    *    and the per-source quantized-log-prob sums (qLogP ≤ 0 always:
    *    c_bg ≤ c_ug), exactly t10's grid;
    *  - means use magnitude-floor division `-((-S) div M)` — operand
    *    nonneg, so truncating (Spark) and floor (DuckDB) agree;
    *  - weights normalize to the 1e-6 grid with LARGEST-REMAINDER exact
    *    distribution (remainder desc, source asc) so Σ weight_ppm is
    *    EXACTLY 1e6; zero total excess (all sources equal) degrades to
    *    uniform via a unit base.
    *
    * Scale shape: one corpus shuffle to (source, bigram) counts; the
    * model aggregates and probe join run on the vocabulary-sized frame;
    * everything from the per-source rollup down is sources-sized
    * (census windows above aggregates — the p33 discipline).
    * Output: (source, n_bigrams, mean_logp_q, excess_q, weight_ppm). */
  def excessLossWeights(docs: DataFrame, sourceCol: String,
                        textCol: String): DataFrame = {
    val db = docBigrams(docs, sourceCol, textCol)
      .withColumnRenamed("doc_id", "source")
    val bgc = db.groupBy("w1", "w2").agg(sum("m").as("c_bg"))
    val ugc = db.groupBy("w1").agg(sum("m").as("c_ug"))
    val qLogP = round(log(col("c_bg").cast("double") / col("c_ug")) * 1e6)
      .cast("long")
    val perSource = db.join(bgc, Seq("w1", "w2")).join(ugc, Seq("w1"))
      .groupBy(col("source"))
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * qLogP).as("s_q"))
      .withColumn("mean_logp_q", expr("-((-s_q) div n_bigrams)"))
    val glob = perSource.agg(sum(col("s_q")).as("gs"), sum(col("n_bigrams")).as("gm"))
      .select(expr("-((-gs) div gm)").as("g_q"))
    val ex = perSource.crossJoin(broadcast(glob))
      .withColumn("excess_q", greatest(col("g_q") - col("mean_logp_q"), lit(0L)))
    val tot = ex.agg(sum(col("excess_q")).as("t_ex"), count(lit(1)).as("n_src"))
    val based = ex.crossJoin(broadcast(tot))
      .withColumn("base", when(col("t_ex") === 0L, lit(1L)).otherwise(col("excess_q")))
      .withColumn("t2", when(col("t_ex") === 0L, col("n_src")).otherwise(col("t_ex")))
      .withColumn("w0", expr("(base * 1000000L) div t2"))
      .withColumn("rem", expr("(base * 1000000L) % t2"))
    // sources-sized windows: the remainder rank and the spent sum
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    based
      .withColumn("_r", lit(1000000L) - sum(col("w0")).over(wAll))
      .withColumn("_rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))))
      .withColumn("weight_ppm",
        col("w0") + when(col("_rk") <= col("_r"), 1L).otherwise(0L))
      .select(col("source"), col("n_bigrams"), col("mean_logp_q"),
        col("excess_q"), col("weight_ppm"))
  }

  /** CALIBRATION (reliability) curve for a quantized classifier score:
    * bin scored documents by fixed-width score bands and report the
    * observed gold-positive rate per band — the diagram a quality-gate
    * THRESHOLD is read off of (if 'score > 0' admits 40%-gold docs, the
    * gate is miscalibrated and the mixture inherits the noise).
    *
    * Bands are FIXED-WIDTH on the integer score grid (clamp to
    * [lo, hi], then (score − lo) div binWidth — nonnegative, so
    * truncating and floor division agree in every engine). Fixed-width
    * banding is deliberate: quantile bands need a global sort/rank, a
    * fixed grid is one map-side expression — the 100-TB-safe shape, and
    * reliability diagrams are conventionally fixed-width anyway.
    *
    * `labels` = (doc_id, lab boolean) gold rows — typically the seed/
    * holdout subset, NOT the whole corpus. One join on doc_id + one
    * bands-sized aggregate. Output: (bin, n_docs, n_pos, pos_ppm). */
  def calibrationCurve(scored: DataFrame, scoreCol: String, labels: DataFrame,
                       binWidth: Long = 200000L, lo: Long = -1000000L,
                       hi: Long = 999999L): DataFrame =
    scored.join(labels, Seq("doc_id"))
      .select(expr(s"(least(greatest($scoreCol, ${lo}L), ${hi}L) - (${lo}L)) " +
          s"div ${binWidth}L").as("bin"),
        col("lab"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lab"), lit(1L)).otherwise(lit(0L))).as("n_pos"))
      .withColumn("pos_ppm", expr("(n_pos * 1000000L) div n_docs"))

  // DSIR importance resampling ---------------------------------------------

  /** Per-(doc, hashed-feature-bucket) counts — DSIR's hashed bag-of-ngrams
    * features: every unigram and word bigram hashed into `buckets`
    * buckets (`hash60 mod B`; hash60 is non-negative, so `%` ≡ `pmod` in
    * every engine). One explode per n-gram order, both collapsed map-side
    * by the per-(doc, bucket) aggregation — the only stage that sees one
    * row per token occurrence. */
  private def dsirTf(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int): DataFrame = {
    val base = docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), col(textCol).as("_tx"))
    val uni = base.select(col("doc_id"),
      explode(split(trim(col("_tx")), "\\s+")).as("f"))
    // compiled token_ngrams kernel (empty below 2 tokens — no size()
    // guard); the feature string is the same space-joined bigram
    val bi = base.select(col("doc_id"),
        explode(graft.expr.hfunctions.token_ngrams(col("_tx"), 2)).as("g"))
      .select(col("doc_id"),
        concat(col("g.w1"), lit(" "), col("g.w2")).as("f"))
    uni.unionByName(bi)
      .select(col("doc_id"), (Dedup.hash60(col("f")) % buckets).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("m"))
  }

  /** DSIR feature-distribution fit — the "Data Selection via Importance
    * Resampling" recipe (Xie et al., NeurIPS 2023): fit hashed-n-gram
    * bucket distributions on a TARGET corpus (the distribution you want
    * more of) and a RAW corpus (what you are selecting from), both
    * Laplace-smoothed over the fixed `buckets`-sized feature space. A
    * document's log importance weight is then
    *
    *   log w(x) = Σ_buckets m_b(x) · [ln p_target(b) − ln p_raw(b)]
    *
    * with each bucket log-likelihood QUANTIZED to the 10⁻⁶ grid (the t10
    * convention) so per-doc sums are order-free exact integer sums.
    *
    * Returns (model, consts): `model` is (b, ltq, lrq) — at most `buckets`
    * rows — and `consts` one row (ut, ur), the two "unseen bucket"
    * likelihoods for buckets absent from both seeds.
    *
    * THE scale property (and DSIR's selling point over vocabulary-keyed
    * models like [[nbTrain]]): the model is FIXED-SIZE — B rows no matter
    * how large the corpus — so it broadcasts unconditionally at any scale
    * and scoring never shuffles a model side. Freeze both frames (write
    * to parquet) to score later increments/streams against a fixed
    * reference. */
  def dsirTrain(target: DataFrame, raw: DataFrame, idCol: String,
                textCol: String, buckets: Int = 1024): (DataFrame, DataFrame) = {
    val ct = dsirTf(target, idCol, textCol, buckets).groupBy("b").agg(sum("m").as("ct"))
    val cr = dsirTf(raw, idCol, textCol, buckets).groupBy("b").agg(sum("m").as("cr"))
    val joined = ct.join(cr, Seq("b"), "full")
      .select(col("b"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val scal = joined.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    def q(x: Column): Column = round(log(x) * 1e6).cast("long")
    val model = joined.crossJoin(broadcast(scal)).select(col("b"),
      q((col("ct") + 1).cast("double") / (col("tt") + buckets)).as("ltq"),
      q((col("cr") + 1).cast("double") / (col("tr") + buckets)).as("lrq"))
    val consts = scal.select(
      q(lit(1.0) / (col("tt") + buckets)).as("ut"),
      q(lit(1.0) / (col("tr") + buckets)).as("ur"))
    (model, consts)
  }

  /** Score documents against a trained DSIR (model, consts) pair:
    * (doc_id, n_feats, logw_q) with `logw_q` the exact-integer quantized
    * log importance weight. Plan shape: one per-(doc, bucket) pre-agg
    * shuffle, a BROADCAST probe join on the fixed-size model (map-only —
    * the model is ≤ `buckets` rows by construction), one per-doc sum
    * shuffle. Nothing model-sized ever crosses the network. */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
                model: DataFrame, consts: DataFrame,
                buckets: Int = 1024): DataFrame =
    dsirTf(docs, idCol, textCol, buckets)
      .join(broadcast(model), Seq("b"), "left")
      .crossJoin(broadcast(consts))
      .withColumn("contrib",
        col("m") * (coalesce(col("ltq"), col("ut")) - coalesce(col("lrq"), col("ur"))))
      .groupBy("doc_id")
      .agg(sum("m").as("n_feats"), sum("contrib").as("logw_q"))

  /** Deterministic Gumbel-top-k importance resampling over DSIR-scored
    * documents: sampling k docs WITHOUT replacement with probability
    * ∝ w(x) is exactly "take the k largest log w(x) + G_x" (the
    * Gumbel-max trick), and the Gumbel noise here is derived from md5 of
    * the doc id — no RNG state, identical on any engine, any partitioning,
    * any rerun:
    *
    *   u = (hash60(seed | id) mod 2^20 + 0.5) / 2^20   ∈ (0, 1)
    *   gumbel_q = round(−ln(−ln u) · 10⁶)
    *   key_q = logw_q + gumbel_q
    *
    * The global top-k is the bounded-heap partial aggregate
    * ([[graft.expr.TopKByScore]]) over ONE group: each task keeps ≤ k
    * candidates, the final exchange carries ≤ k×tasks rows — no global
    * sort, no full-corpus window. Output: the input row + gumbel_q,
    * key_q, rk (1..k by key_q desc, id asc). */
  def dsirResample(scored: DataFrame, idCol: String, weightCol: String,
                   k: Int, seed: String = "dsir"): DataFrame = {
    val M = 1L << 20
    val u = (Dedup.hash60(concat(lit(seed + "|"), col(idCol).cast("string")))
      .mod(M).cast("double") + 0.5) / M
    // `keyed` forks into the top-k aggregate AND the join-back probe; the
    // inner join infers isnotnull(id) on the probe copy only, pushing it
    // below every exchange of the scoring chain and making the two copies
    // canonical-distinct — the whole corpus-sized dsirTf stage then
    // materializes twice. Seeding the constraint before the fork keeps the
    // deep exchanges canonical-equal so AQE reuses them (the docBigrams /
    // span-dedup discipline); a null id could never survive the join anyway
    val keyed = scored.filter(col(idCol).isNotNull)
      .withColumn("gumbel_q", round(-log(-log(u)) * 1e6).cast("long"))
      .withColumn("key_q", col(weightCol) + col("gumbel_q"))
    val top = keyed.groupBy()
      .agg(graft.expr.hfunctions.topk_by(
        col("key_q").cast("double"), col(idCol), k).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.n_id").as(idCol), col("t.rk").as("rk"))
    keyed.join(broadcast(top), Seq(idCol))
  }

  // KMV distinct-cardinality sketches ---------------------------------------

  /** Per-group KMV sketch of distinct word-n-gram shingle hashes: the
    * ≤ k smallest distinct md5-60 values via [[graft.expr.KmvSketch]] —
    * dedup happens inside the bounded aggregate buffer, so the exchange
    * carries ≤ groups×k longs, never a (group, hash) distinct shuffle.
    * Sketches MERGE (commutative, associative, idempotent): union two
    * frames' exploded mins and re-aggregate to fold increments into a
    * standing sketch at sketch-sized cost. */
  def kmvShingleSketch(docs: DataFrame, groupCol: String, textCol: String,
                       k: Int, n: Int = 3): DataFrame =
    docs.filter(size(split(trim(col(textCol)), "\\s+")) >= n)
      .select(col(groupCol),
        explode(graft.expr.hfunctions.shingle_hashes60(col(textCol), n)).as("h"))
      .groupBy(col(groupCol))
      .agg(graft.expr.hfunctions.kmv_sketch(col("h"), k).as("mins"))

  /** Cardinality read-out of a (group, mins) sketch frame: under-full →
    * the array IS the distinct set (count exact, kth = 0); full → the
    * KMV estimate (k−1)·2⁶⁰/kth-min, deterministic over the md5-60 hash
    * space so the estimate itself is oracle-checkable. */
  def kmvSummary(sk: DataFrame, groupCol: String, k: Int): DataFrame =
    sk.select(col(groupCol),
      size(col("mins")).cast("long").as("n_mins"),
      when(size(col("mins")) < k, lit(0L))
        .otherwise(element_at(col("mins"), k)).as("kth_h"),
      when(size(col("mins")) < k, size(col("mins")).cast("long"))
        .otherwise(round(lit((k - 1).toDouble) * lit(1152921504606846976L.toDouble)
          / element_at(col("mins"), k).cast("double")).cast("long")).as("est_q"))

  /** Grouped FEATURE STANDARDIZATION without a window (t23): per-group
    * z-scores for an integer feature — the "normalize quality/length
    * signals within each language (or domain, or source)" step every
    * mixed-corpus threshold rule needs: an absolute cutoff that is
    * strict for English is lax for a low-resource language, z-scores
    * within the group make one threshold portable.
    *
    * Scale: stats are ONE groupBy producing (n, Σx, Σx²) — groups-sized
    * — broadcast back over a second corpus scan; no window function
    * over the corpus anywhere (a `Window.partitionBy(group)` here
    * sorts every partition — the trap this operator exists to avoid).
    * z = (n·x − Σx)/√(n·Σx² − Σx²): numerator and radicand exact
    * 64-bit integers, ONE double division — engine-portable
    * bit-for-bit. Zero-variance groups (and singletons) score 0. At
    * corpus scale the Σx² products want a `decimal(38,0)` widen if the
    * feature exceeds ~2²⁰ per doc; lengths and token counts don't. */
  def groupedZScores(docs: DataFrame, idCol: String, groupCol: String,
                     x: Column): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
      x.cast("long").as("x"))
    val st = d.groupBy(col("grp")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val rad = col("n") * col("sxx") - col("sx") * col("sx")
    d.join(broadcast(st), Seq("grp"))
      .withColumn("z", when(rad <= 0, lit(0.0))
        .otherwise((col("n") * col("x") - col("sx")).cast("double") /
          sqrt(rad.cast("double"))))
      .select(col("doc_id"), col("grp"), col("z"))
  }

  /** Per-source corpus DATASHEET — the "datasheet for datasets" report a
    * release ships: per source, document/token volume, exact-duplicate
    * rate (canonical-fingerprint keep-first, the d01 notion), English
    * share, and mean composite quality on the 1e-6 grid. Every number
    * is computed by the engine's own operators, so the datasheet is
    * reproducible from the corpus alone.
    *
    * Scale: one scan computes fingerprint/tokens/quality per row
    * (codegen'd kernels); duplicate labeling is the d14 discipline — an
    * fp-keyed min aggregate joined back (never a window over fp
    * groups, whose skew a single viral duplicate would concentrate);
    * the final aggregate is sources-sized. Quality quantizes PER DOC
    * before the mean, so the sum is order-free exact integers. */
  def datasheet(docs: DataFrame, idCol: String, sourceCol: String,
                textCol: String, langCol: String): DataFrame = {
    val enriched = docs.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"),
      TextAnalysis.tokenCount(col(textCol)).as("nt"),
      round(TextAnalysis.qualityScore(col(textCol)) * 1e6).cast("long").as("q_q"),
      (col(langCol) === "en").as("is_en"))
    val keepers = enriched.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
    enriched.join(keepers, Seq("fp"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L)).as("n_dups"),
        sum(when(col("is_en"), 1L).otherwise(0L)).as("n_en"),
        round(sum(col("q_q")) * lit(1.0) / count(lit(1))).cast("long")
          .as("mean_quality_q"))
  }

  /** Population Stability Index between a reference and a current
    * snapshot over a pre-bucketed feature column — the distribution-
    * drift alarm for corpus refreshes ("did the new crawl's length /
    * quality / language profile move?"). Per observed bin (union of
    * both sides): smoothed shares p = (n + 1)/(N + B) (add-one over the
    * B observed bins, so empty-on-one-side bins stay finite), PSI term
    * = (p_cur − p_ref)·ln(p_cur/p_ref), surfaced on the 1e-6 grid (the
    * t10 ln-quantization convention — raw doubles aren't hash-portable).
    * Σ psi_q / 1e6 ≳ 0.2 is the conventional "retrain" line.
    *
    * Scale: one bins-keyed aggregation per side (bins are bounded by
    * construction), then a bins-sized outer join — no corpus-sized
    * shuffle beyond the two groupBys, no window anywhere. */
  def psiDrift(ref: DataFrame, cur: DataFrame, binCol: String): DataFrame = {
    def side(df: DataFrame, n: String) =
      df.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as(n))
    psiFromCounts(side(ref, "n_ref"), side(cur, "n_cur"))
  }

  /** The PSI formula over pre-aggregated histograms — (bin, n_ref) ×
    * (bin, n_cur) — shared by the batch operator and the streaming
    * monitor ([[graft.streaming.StreamPsi]]), whose state IS the counts
    * frame (re-expanding it to rows would be histogram-total-sized). */
  private[graft] def psiFromCounts(refCounts: DataFrame,
                                   curCounts: DataFrame): DataFrame = {
    val joined = refCounts.join(curCounts, Seq("bin"), "full")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // totals + bin count: one census-sized aggregate broadcast back
    val tot = joined.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"), count(lit(1)).as("b"))
    def p(n: Column, t: Column, b: Column): Column =
      (n + 1L).cast("double") / (t + b).cast("double")
    joined.crossJoin(broadcast(tot))
      .withColumn("psi_q", {
        val pr = p(col("n_ref"), col("t_ref"), col("b"))
        val pc = p(col("n_cur"), col("t_cur"), col("b"))
        round((pc - pr) * log(pc / pr) * 1e6).cast("long")
      })
      .select(col("bin"), col("n_ref"), col("n_cur"), col("psi_q"))
  }

  /** Tokenizer fertility census per group (language, domain): how many
    * sub-lexical tokens the tokenizer spends per whitespace word, and
    * how many characters each buys — THE unit-economics check before
    * committing a token budget to a multilingual mix (a tokenizer with
    * 3× fertility on one language silently triples that language's
    * cost in [[Sampling.waterFillBudget]] terms). Counts are exact
    * integer sums (one corpus scan, one groups-sized aggregate);
    * the two ratios surface on the 1e-6 grid.
    *
    * `pre` is the sub-lexical counting column (e.g.
    * [[RegexBpeTokenizer.count]]'s codegen'd one-pass kernel). */
  def tokenizerFertility(docs: DataFrame, groupCol: String,
                         textCol: String, pre: Column): DataFrame =
    docs
      .select(col(groupCol).as("grp"),
        length(col(textCol)).cast("long").as("nc"),
        TextAnalysis.tokenCount(col(textCol)).as("nw"),
        pre.as("np"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
        sum(col("nw")).as("n_words"), sum(col("np")).as("n_pretokens"))
      .withColumn("fertility_q",
        when(col("n_words") > 0,
          round(col("n_pretokens") * 1e6 / col("n_words")).cast("long"))
          .otherwise(lit(null).cast("long")))
      .withColumn("chars_per_tok_q",
        when(col("n_pretokens") > 0,
          round(col("n_chars") * 1e6 / col("n_pretokens")).cast("long"))
          .otherwise(lit(null).cast("long")))

  /** TextRank keyword extraction at corpus granularity: PageRank over
    * the word CO-OCCURRENCE graph (adjacent-token pairs, symmetric,
    * weight = co-occurrence count; words below `minCount` occurrences
    * pruned as noise) — the graph-centrality alternative to frequency
    * (t09) and TF-IDF (t11) term ranking: a term is important if
    * important terms co-occur with it.
    *
    * Built ENTIRELY from the engine's own primitives: adjacency is a
    * pure array projection per document (no shuffle — the pair list
    * never leaves the row until the edge aggregate), the frequent-word
    * prune is a vocab-sized semi-join on each endpoint, and the ranking
    * IS [[Relational.pageRank]] (integer fixed-point, engine-bit-
    * identical — see q26). The graph is VOCABULARY-bounded, so the
    * iteration loop costs vocab-sized joins regardless of corpus size;
    * the corpus is paid once, in the edge aggregate. Output: the top-k
    * (term, pr_q), rank grid 1e-12. */
  def textRankTerms(docs: DataFrame, idCol: String, textCol: String,
                    minCount: Long = 3L, k: Int = 20): DataFrame = {
    val base = docs.filter(length(trim(col(textCol))) > 0)
    val words = base.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
    val kept = words.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount).select(col("w"))
    // adjacent-token pairs are token 2-grams: the compiled token_ngrams
    // kernel (empty below 2 tokens — no size guard, no interpreted
    // transform/sequence HOF chain)
    val pairs = base
      .select(explode(graft.expr.hfunctions.token_ngrams(col(textCol), 2)).as("p"))
      .select(col("p.w1").as("a"), col("p.w2").as("b"))
      .filter(col("a") =!= col("b"))
      .join(kept.select(col("w").as("a")), Seq("a"), "left_semi")
      .join(kept.select(col("w").as("b")), Seq("b"), "left_semi")
    val eg = pairs.select(col("a").as("sw"), col("b").as("dw"))
      .unionByName(pairs.select(col("b").as("sw"), col("a").as("dw")))
      .groupBy(col("sw"), col("dw")).agg(count(lit(1)).as("w"))
    val edges = eg.select(Dedup.hash60(col("sw")).as("src"),
      Dedup.hash60(col("dw")).as("dst"), col("w"))
    val pr = Relational.pageRank(edges,
      kept.select(Dedup.hash60(col("w")).as("item")), iterations = 10)
    pr.join(kept.select(Dedup.hash60(col("w")).as("item"), col("w").as("term")),
        Seq("item"))
      .select(col("term"), col("pr_q"))
      .orderBy(col("pr_q").desc, col("term")).limit(k)
  }

  /** Dedup-aware (EFFECTIVE) token accounting per source: raw token
    * counts double-bill every mirror, so a mixture weighted on raw
    * volume over-samples whatever is most copied. Each exact-dup
    * cluster (d01's canonical fingerprint, counted ACROSS sources) gets
    * its tokens down-weighted by 1/cluster_size on the 1e-6 grid —
    * Σ eff over all sources ≈ the deduped corpus's token count, and a
    * source that is pure mirrors contributes ~nothing. The
    * "count duplicates once" correction the mixture rows
    * ([[Sampling.rebalanceToMixture]], [[Sampling.waterFillBudget]])
    * should be fed at 100 TB.
    *
    * The floor is taken at (fingerprint, source) granularity —
    * eff_q = Σ_{fp,src} (tok_sum · 1e6) div size_fp — which is what
    * makes the whole computation join-back-free at corpus scale:
    *   1. ONE corpus scan → (fp, source) aggregate (map-side partials
    *      collapse a 10⁹-times-mirrored page before the shuffle);
    *   2. cluster sizes = a second, (fp-count)-sized aggregate;
    *   3. an fp-keyed join of the two SMALL frames;
    *   4. the sources-sized rollup.
    * No per-document weight join ever touches the corpus. Output:
    * (source, n_docs, raw_tokens, eff_tokens_q). */
  /** Vocabulary-coverage census: the share of each group's token
    * OCCURRENCES covered by the global top-`v` vocabulary — the check
    * run before fixing a vocabulary size for a multilingual corpus (a
    * language whose coverage craters at the chosen V pays for it in
    * UNK/byte-fallback rates forever). Vocabulary selection is
    * deterministic: count desc, then the word's 60-bit hash asc (t09's
    * tiebreak convention).
    *
    * Scale shape: one scan to the word stream; the count aggregate's
    * output is vocabulary-sized and the top-V is a TakeOrdered (per-
    * partition top-V, then a V-sized merge — never a full sort); the
    * V-sized vocabulary broadcasts back over a second stream pass for
    * the groups-sized coverage rollup. Output: (grp, n_tokens,
    * n_covered, cov_q) with cov_q on the 1e-6 grid. */
  def vocabCoverage(docs: DataFrame, groupCol: String, textCol: String,
                    v: Int): DataFrame = {
    def toks = docs.filter(length(trim(col(textCol))) > 0)
      .select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, Dedup.hash60(col("w")).asc)
      .limit(v)
      .select(col("w"))
    toks.join(broadcast(vocab.withColumn("_vc_hit", lit(1L))), Seq("w"), "left")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("_vc_hit"), lit(0L))).as("n_covered"))
      .withColumn("cov_q",
        round(col("n_covered") * 1e6 / col("n_tokens")).cast("long"))
  }

  /** HOST-level quality gate — the RefinedWeb "site-level filtering"
    * step: rank hosts by their documents' mean quality signal and gate
    * every document by its HOST's verdict, not its own score (a spam
    * farm's best page is still spam-farm content; a good site's worst
    * page usually is not). The host key comes off the CANONICALIZED url
    * ([[TextAnalysis.canonicalizeUrl]] — tracking params / fragment /
    * case noise collapse first, so one logical site is one key).
    *
    * Verdict, all integer on the 1e-6 grid: a host with
    * `host_docs >= minDocs` is admitted iff its mean per-doc quality
    * (truncating div of the ppm sum) clears the CORPUS-WIDE mean — a
    * self-calibrating threshold, no magic constant to re-tune per
    * corpus; a host with fewer docs is admitted by default
    * (insufficient evidence — per-doc gates, t02/t14, still apply
    * downstream).
    *
    * Scale shape: one corpus scan → host-keyed aggregate with map-side
    * partials (the hot-host skew collapses before the shuffle), the
    * 1-row corpus mean rides a broadcast crossJoin, and the hosts-sized
    * verdict frame broadcasts back over a second scan — the corpus
    * never shuffles by host for the gate itself. Output: (idCol, host,
    * host_docs, host_q_ppm, admitted). */
  def hostQualityGate(docs: DataFrame, idCol: String, urlCol: String,
                      textCol: String, minDocs: Long = 10L): DataFrame = {
    def perDoc = docs.select(col(idCol),
      regexp_extract(TextAnalysis.canonicalizeUrl(col(urlCol)),
        "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1).as("host"),
      round(TextAnalysis.qualityScore(col(textCol)) * 1e6).cast("long").as("q_ppm"))
    val hosts = perDoc.groupBy(col("host"))
      .agg(count(lit(1)).as("host_docs"), sum(col("q_ppm")).as("sq"))
    val global = hosts.agg(
      expr("sum(sq) div sum(host_docs)").as("g_ppm"))
    val verdicts = hosts.crossJoin(broadcast(global))
      .select(col("host"), col("host_docs"),
        expr("sq div host_docs").as("host_q_ppm"),
        (col("host_docs") < minDocs ||
          expr("sq div host_docs") >= col("g_ppm")).as("admitted"))
    perDoc.join(broadcast(verdicts), Seq("host"))
      .select(col(idCol), col("host"), col("host_docs"),
        col("host_q_ppm"), col("admitted"))
  }

  def effectiveTokens(docs: DataFrame, sourceCol: String,
                      textCol: String): DataFrame = {
    val g1 = docs
      .select(col(sourceCol).as("source"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"),
        TextAnalysis.tokenCount(col(textCol)).as("tok"))
      .groupBy(col("fp"), col("source"))
      .agg(count(lit(1)).as("n"), sum(col("tok")).as("tok_sum"))
    val sizes = g1.groupBy(col("fp")).agg(sum(col("n")).as("cl_size"))
    g1.join(sizes, Seq("fp"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"),
        sum(col("tok_sum")).as("raw_tokens"),
        sum(expr("(tok_sum * 1000000L) div cl_size")).as("eff_tokens_q"))
  }
}
