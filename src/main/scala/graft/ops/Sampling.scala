package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-selection operators for training-data pipelines. */
object Sampling {

  /** md5-derived uniform bucket in [0, buckets) for any key — the
    * determinism primitive behind splits and sampling (never Spark's
    * `rand()`: reshuffles, retries, and engine changes must not move a
    * document between splits). */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(Dedup.hash60(key.cast("string")), lit(buckets.toLong))

  /** Deterministic train/val/test assignment by id hash: thresholds are
    * cumulative percentages (e.g. 90/95 → 90% train, 5% val, 5% test).
    * Pure projection — no shuffle, stable across any recomputation. */
  def hashSplit(docs: DataFrame, idCol: String,
                trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val b = hashBucket(col(idCol), 100)
    docs.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Stratified deterministic sampling: keep a row iff its id hash falls
    * under its stratum's rate (per-mille). Strata absent from `rates`
    * fall back to `defaultPerMille`. The canonical "down-sample the
    * dominant language/domain" step — one projection + filter, no
    * shuffle, reproducible on any engine. The rate lookup is a single
    * map-literal `element_at`, not a `when()` chain, so the Catalyst
    * tree stays flat however many strata the map names. */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Int],
                       defaultPerMille: Int = 1000): DataFrame = {
    val rate =
      if (rates.isEmpty) lit(defaultPerMille)
      else coalesce(
        element_at(typedLit(rates), col(stratumCol)), lit(defaultPerMille))
    docs.filter(hashBucket(col(idCol), 1000) < rate)
  }

  /** Exact-count quota sampling: keep exactly `min(quota, stratum size)`
    * documents per stratum, chosen deterministically by id-hash rank
    * (smallest md5 ranks win; ties — astronomically rare — break by id).
    * Where [[stratifiedSample]] keeps a binomially-distributed *fraction*,
    * this hits the target *count* exactly — the "rebalance the corpus to
    * a target language/domain mixture" step where the mixture is a hard
    * budget, not a rate. Strata absent from `quotas` fall back to
    * `defaultQuota` (default: keep all).
    *
    * Scale shape — no per-stratum sort ever runs, so a giant stratum
    * (the SCALE.md skew hazard: one stratum = one sort task) cannot
    * exist. The rank hash is range-bucketed into `tiers` tiers (tier =
    * top bits of the hash, so tier order == hash order and the buckets
    * are uniform):
    *
    *  1. a per-(stratum, tier) histogram — map-side-collapsing count,
    *     ≤ strata×tiers rows, never collected to the driver;
    *  2. quotas broadcast-join the histogram (a (stratum, quota) frame,
    *     not a `when()` chain — Catalyst depth stays O(1) for thousands
    *     of strata), and a prefix-sum window over the TINY histogram
    *     (≤ `tiers` rows per stratum) finds each stratum's boundary
    *     tier: the first tier the quota lands inside, plus how many of
    *     its rows still fit — ONE row per stratum, broadcast back;
    *  3. docs rank within (stratum, tier) groups — each sort task sees
    *     ≤ 1/tiers of a stratum — and keep: any tier below the
    *     boundary, the boundary tier up to the remainder, nothing
    *     above.
    *
    * Selection is exactly the per-stratum (hash, id)-rank prefix: tier
    * is the hash's high bits, so (tier, hash, id) ordering == (hash, id)
    * ordering. Internal columns are uniquified against the input schema
    * (no silent clobbering). */
  def quotaSample(docs: DataFrame, idCol: String, stratumCol: String,
                  quotas: Map[String, Long],
                  defaultQuota: Long = Long.MaxValue,
                  tiers: Int = 1024): DataFrame = {
    require(tiers > 0 && (tiers & (tiers - 1)) == 0,
      s"tiers must be a power of two, got $tiers")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(tiers)
    def fresh(base: String): String = {
      var n = base
      while (docs.columns.contains(n)) n += "_"
      n
    }
    val hC = fresh("_q_hash"); val tC = fresh("_q_tier")
    val nC = fresh("_q_n"); val qC = fresh("_q_quota")
    val bC = fresh("_q_below"); val btC = fresh("_q_btier")
    val remC = fresh("_q_rem"); val rkC = fresh("_q_rk")

    val tiered = docs
      .withColumn(hC, Dedup.hash60(col(idCol).cast("string")))
      .withColumn(tC, shiftright(col(hC), shift))

    val spark = docs.sparkSession
    import spark.implicits._
    val quotaDf = quotas.toSeq.toDF(stratumCol, qC)

    val wCum = Window.partitionBy(col(stratumCol)).orderBy(col(tC))
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = tiered.groupBy(col(stratumCol), col(tC))
      .agg(count(lit(1)).as(nC))
      .join(broadcast(quotaDf), Seq(stratumCol), "left")
      .withColumn(qC, coalesce(col(qC), lit(defaultQuota)))
      .withColumn(bC, coalesce(sum(col(nC)).over(wCum), lit(0L)))
    // the unique per-stratum crossing tier: quota not yet exhausted
    // before it (below ≤ quota) but exhausted inside it (quota − below
    // < count). Strata whose total fits the quota have no row → keep all.
    // boundary join is NULL-SAFE on the stratum: a null stratum is a
    // stratum like any other (it gets defaultQuota via the hist quota
    // coalesce); a null-rejecting equi-join here would silently keep
    // the whole null group
    val bsC = fresh("_q_bstratum")
    val boundary = hist
      .filter(col(bC) <= col(qC) && col(qC) - col(bC) < col(nC))
      .select(col(stratumCol).as(bsC), col(tC).as(btC), (col(qC) - col(bC)).as(remC))

    val wRk = Window.partitionBy(col(stratumCol), col(tC))
      .orderBy(col(hC), col(idCol))
    tiered.withColumn(rkC, row_number().over(wRk))
      .join(broadcast(boundary), col(stratumCol) <=> col(bsC), "left")
      .filter(col(btC).isNull || col(tC) < col(btC) ||
        (col(tC) === col(btC) && col(rkC) <= col(remC)))
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** Rebalance the corpus to a TARGET stratum mixture given as integer
    * weights (parts) — the DoReMi/data-mixture step where the mixture is
    * the spec and the data decides how much total volume that mixture
    * supports. Water-filling: with W = Σ weights, the largest total T
    * such that every target stratum can fill its share is
    * `T = min_s floor(size_s · W / w_s)` (the scarcest stratum binds);
    * each stratum then keeps exactly `floor(w_s · T / W)` documents,
    * chosen deterministically by id-hash rank via [[quotaSample]].
    * Strata outside the mixture are dropped (the mixture is the whole
    * spec). All arithmetic is exact 64-bit integer — quotas are
    * bit-identical on any engine, no float shares.
    *
    * Scale shape: the census is one map-side-collapsing `groupBy.count`
    * whose result is ≤ #strata rows (a bounded driver collect, same
    * contract as the token-budget histogram); selection inherits
    * [[quotaSample]]'s tier-bucketed plan — no giant-stratum sort. */
  def rebalanceToMixture(docs: DataFrame, idCol: String, stratumCol: String,
                         weights: Map[String, Long],
                         tiers: Int = 1024): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be a non-empty map of positive parts")
    val target = docs.filter(col(stratumCol).isin(weights.keys.toSeq: _*))
    waterFill(target, idCol, stratumCol, weights, census(target, stratumCol), tiers)
  }

  /** Temperature-scaled mixture: rebalance toward the smoothed stratum
    * distribution `p_s ∝ n_s^alpha` — the multilingual-sampling classic
    * (alpha < 1 upsamples the tail's SHARE by downsampling the head;
    * alpha = 1 is the natural mixture, a no-op). The smoothed weights
    * feed the same exact-integer water-filling as [[rebalanceToMixture]],
    * so the head strata bind the total and every stratum keeps exactly
    * `floor(w_s·T/W)` documents, chosen by id-hash rank.
    *
    * Determinism: the weights are computed ONCE driver-side and enter
    * the plan as literals, so any single run is exactly reproducible.
    * For cross-ENGINE bit-parity (the DuckDB oracle), alpha = 0.5 uses
    * exact integer sqrt and alpha = 1 the identity — both engine-proof;
    * other alphas go through `math.pow`, whose last-ulp rounding is the
    * JVM's (document the alpha with the run). NULL strata are outside
    * any mixture and are dropped, like strata outside
    * [[rebalanceToMixture]]'s spec. */
  def temperatureMixture(docs: DataFrame, idCol: String, stratumCol: String,
                         alpha: Double = 0.5, tiers: Int = 1024): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    val target = docs.filter(col(stratumCol).isNotNull)
    // alpha = 1 is the natural mixture — the identity by construction
    // (w_s = n_s → t = W → quota_s = n_s, every doc kept). Short-circuit
    // it: the water-fill's n_s·ΣN product would overflow 2^63 at ~3e9
    // docs, i.e. exactly at the corpus scale where the no-op is hit most;
    // genuinely weighted paths keep the fail-loud multiplyExact.
    if (alpha == 1.0) return target
    val sizes = census(target, stratumCol)
    val weights = sizes.map { case (s, n) =>
      s -> (if (alpha == 0.5) math.max(1L, isqrt(n))
            else math.max(1L, math.floor(math.pow(n.toDouble, alpha)).toLong))
    }
    if (weights.isEmpty) target
    else waterFill(target, idCol, stratumCol, weights, sizes, tiers)
  }

  /** Stratum census as a bounded driver collect (≤ #strata rows — the
    * same contract as the token-budget histogram). */
  private def census(docs: DataFrame, stratumCol: String): Map[String, Long] =
    docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Exact-integer water-filling over a (stratum → parts) spec:
    * T = min_s floor(n_s·W/w_s), quota_s = floor(w_s·T/W), selection via
    * [[quotaSample]]. addExact/multiplyExact throughout — corpus-scale
    * weight×size products past 2^63 fail loudly instead of wrapping into
    * negative quotas. */
  private def waterFill(target: DataFrame, idCol: String, stratumCol: String,
                        weights: Map[String, Long], sizes: Map[String, Long],
                        tiers: Int): DataFrame = {
    val W = weights.values.foldLeft(0L)(Math.addExact)
    val t = weights.map { case (s, w) =>
      Math.multiplyExact(sizes.getOrElse(s, 0L), W) / w
    }.min
    val quotas = weights.map { case (s, w) => s -> Math.multiplyExact(w, t) / W }
    quotaSample(target, idCol, stratumCol, quotas, defaultQuota = 0L, tiers)
  }

  /** EXACT global rank by (score DESC, id ASC) — curriculum ordering
    * (easy-to-hard data ordering, best-first selection cursors) — with
    * NO global sort: `row_number() OVER (ORDER BY score DESC)` puts the
    * whole corpus through one task, the classic driver-melting window.
    * Instead the score in [0, 1] buckets into `buckets` tiers (tier is
    * monotone in score, so tier order IS score order), a ≤`buckets`-row
    * driver census yields each tier's exclusive offset, and the
    * within-tier rank is a window over ~1/buckets of the corpus —
    * the same shape as [[quotaSample]]'s rank and [[packSequences]]'
    * tape, applied to exact global ranking.
    *
    * Score ATOMS don't break the bound: a clamped quality score piles a
    * large corpus fraction onto exactly 0.0 or 1.0, and that tier's
    * window partition would otherwise revert toward the global sort this
    * operator exists to avoid. Any tier heavier than `heavyFactor` ×
    * the expected tier size splits into sub-partitions by a SECOND
    * monotone key — finer score buckets for a tier with score spread,
    * the id's value range for a single-score atom tier (monotone in the
    * tie-break, so exactness holds; needs a numeric id — an atom tier
    * with non-numeric ids keeps one partition, the documented caveat) —
    * with a second ≤(2×buckets)-row census providing sub-offsets (the
    * sub counts sum to ≤ corpus/target + #tiers regardless of skew).
    * Output: (idCol, scoreCol, rank), rank 1 = highest score, ties
    * broken by ascending id (deterministic on any engine); NULL scores
    * are unrankable and dropped. */
  def curriculumRank(docs: DataFrame, idCol: String, scoreCol: String,
                     buckets: Int = 1024, heavyFactor: Int = 8): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(heavyFactor > 0, s"heavyFactor must be positive, got $heavyFactor")
    val spark = docs.sparkSession
    import spark.implicits._
    val idIsNumeric = docs.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val idDbl = if (idIsNumeric) col(idCol).cast("double") else lit(0.0)
    val tiered = docs.filter(col(scoreCol).isNotNull)
      .withColumn("_tier", least(lit(buckets - 1),
        greatest(lit(0), floor(col(scoreCol) * buckets))).cast("int"))
    // census: counts + the bounds the heavy-tier split needs (score
    // bounds decide atomness, id bounds give the monotone id → sub map)
    val census = tiered.groupBy("_tier").agg(
        count(lit(1)).as("_n"),
        min(col(scoreCol).cast("double")).as("_slo"),
        max(col(scoreCol).cast("double")).as("_shi"),
        min(idDbl).as("_ilo"), max(idDbl).as("_ihi"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val total = census.map(_._2).sum
    val target = math.max(1L, total / buckets)
    // (tier, atom?, sub-count, id bounds); sub-count 1 = no split
    val params = census.map { case (t, n, slo, shi, ilo, ihi) =>
      val atom = slo == shi
      val s =
        if (n <= heavyFactor.toLong * target) 1
        else if (atom && !idIsNumeric) 1 // caveat: no monotone sub-key exists
        else math.min(buckets.toLong, (n + target - 1) / target).toInt
      (t, atom, s, ilo, ihi)
    }
    val anySplit = params.exists(_._3 > 1)
    val pDf = params.toSeq.toDF("_tier", "_atom", "_s", "_ilo", "_ihi")
    // the sub-key: monotone NONDECREASING in the tier's residual sort
    // key (score for spread tiers, id for atoms), so equal keys never
    // straddle a sub boundary and group order extends the global order
    val withSub = tiered.join(broadcast(pDf), Seq("_tier"))
      .withColumn("_sub",
        when(col("_s") <= 1, lit(0))
          .when(col("_atom"), least(col("_s") - 1, greatest(lit(0),
            floor((idDbl - col("_ilo")) / (col("_ihi") - col("_ilo") + 1.0)
              * col("_s")))))
          .otherwise(least(col("_s") - 1, greatest(lit(0),
            floor((col(scoreCol).cast("double") * buckets - col("_tier"))
              * col("_s")))))
          .cast("int"))
    val groupCounts: Map[(Int, Int), Long] =
      if (!anySplit) census.map { case (t, n, _, _, _, _) => (t, 0) -> n }.toMap
      else withSub.groupBy("_tier", "_sub").agg(count(lit(1)).as("_n"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // global group order: tiers descending; within a tier, sub order
    // follows the residual key's direction (score DESC → higher score
    // sub first; atom id ASC → lower id sub first)
    val ordered: Seq[(Int, Int)] = params.sortBy(-_._1).toSeq.flatMap {
      case (t, atom, s, _, _) =>
        val subs = 0 until math.max(s, 1)
        (if (atom) subs else subs.reverse).map(t -> _)
    }
    val offs = ordered.scanLeft(0L)((acc, g) => acc + groupCounts.getOrElse(g, 0L))
    val offDf = ordered.zip(offs).map { case ((t, sb), o) => (t, sb, o) }
      .toDF("_tier", "_sub", "_off")
    val w = Window.partitionBy(col("_tier"), col("_sub"))
      .orderBy(col(scoreCol).desc, col(idCol))
    withSub.join(broadcast(offDf), Seq("_tier", "_sub"))
      .withColumn("rank", row_number().over(w).cast("long") + col("_off"))
      .select(idCol, scoreCol, "rank")
  }

  /** LEAKAGE-SAFE train/val/test split (p29): [[hashSplit]]'s silent
    * failure mode on a real corpus is eval contamination — near-duplicate
    * documents hash independently, so a test doc's near-copy lands in
    * train and the benchmark leaks. Here the split key is the near-dup
    * CLUSTER, not the document: LSH-verified pairs
    * ([[Dedup.minhashLshPairs]]) → connected components → every member
    * splits by the hash of its cluster label (singletons by their own
    * id — identical to [[hashSplit]] for them). Near-dups share a split
    * BY CONSTRUCTION, not by luck. Output: (doc_id, grp, split).
    *
    * Scale: the pair search is the one corpus-sized shuffle (banded,
    * df-bounded); components run over the PAIR set — duplicates only, a
    * small fraction of a deduplicated-ish corpus; the label join-back's
    * right side is duplicate-sized. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                       trainPct: Int = 90, valPct: Int = 5,
                       bands: Int = 0, rowsPerBand: Int = 0, n: Int = 3,
                       threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashLshPairs(docs, idCol, textCol, bands, rowsPerBand,
      n, threshold)
    val clusters = Relational.connectedComponents(pairs.select("a_id", "b_id"))
    val labeled = docs.select(col(idCol).cast("long").as("doc_id"))
      .join(clusters.select(col("node").as("doc_id"), col("cluster")),
        Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("cluster"), col("doc_id")))
    val b = hashBucket(col("grp"), 100)
    labeled.select(col("doc_id"), col("grp"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** EPOCH-SHUFFLED training order (p28): the data-ordering step of a
    * multi-epoch training run — every epoch must visit the whole corpus
    * in a DIFFERENT pseudo-random order, and the order must be
    * reproducible across retries, partitionings, and engines (never
    * `rand()`). Epoch e's key for doc d is `md5(e ‖ d)` scaled into
    * [0, 1) — a fresh deterministic permutation per epoch — and ranking
    * runs through [[curriculumRank]]'s tier machinery, so there is NO
    * global sort anywhere: the shuffle key is uniform, which is the
    * easy, perfectly-balanced case of the tiered ranking. Output:
    * (epoch, doc_id, step) with steps globally consecutive — epoch e
    * occupies [(e−1)·n, e·n). At 100 TB you materialize each epoch
    * lazily as training reaches it; the per-epoch cost is one ranking
    * pass, and nothing here depends on epochs being built together. */
  def epochSchedule(docs: DataFrame, idCol: String, epochs: Int,
                    buckets: Int = 1024): DataFrame = {
    require(epochs > 0, s"epochs must be positive: $epochs")
    // the id frame is consumed 1 + epochs×(census + rank) times — behind
    // a DERIVED input (p30 feeds the leakage-safe split: LSH pairs +
    // connected components) each consumption re-executes that whole
    // chain, so materialize the ids ONCE (they are the narrowest
    // possible frame to pin; the caller's session releases the block
    // with the returned frame)
    val ids = docs.select(col(idCol).as("doc_id")).localCheckpoint()
    val n = ids.count()
    (1 to epochs).map { e =>
      val scored = ids.select(col("doc_id"))
        .withColumn("score",
          Dedup.hash60(concat(lit(s"${e}_"), col("doc_id").cast("string")))
            .cast("double") / lit(1152921504606846976.0))
      curriculumRank(scored, "doc_id", "score", buckets)
        .select(lit(e.toLong).as("epoch"), col("doc_id"),
          (col("rank") + lit((e - 1).toLong * n)).as("step"))
    }.reduce(_ unionByName _)
  }

  /** floor(sqrt(n)) in exact integer arithmetic (n ≥ 0). */
  private[ops] def isqrt(n: Long): Long = {
    var x = math.sqrt(n.toDouble).toLong
    while (x > 0 && x > n / x) x -= 1
    while (x + 1 <= n / (x + 1)) x += 1
    x
  }

  /** Deterministic sequence packing (the GPT-style concat-then-chunk
    * step): lay every document out on ONE global token tape in
    * (id-hash, id) order — a deterministic corpus shuffle, stable under
    * retries and engines — and cut the tape into fixed `seqLen`-token
    * training sequences. Output per document: its token count, its
    * global start offset on the tape, and the first/last sequence index
    * it lands in (a document crossing a boundary spans both). Documents
    * with no tokens are dropped (they occupy no tape).
    *
    * The semantics are a global running sum, but nothing global ever
    * sorts: the hash's top bits bucket the tape (bucket order == hash
    * order — the [[quotaSample]] tiering trick), a per-bucket token
    * histogram (≤ `buckets` rows, the bounded-driver-collect contract)
    * yields each bucket's exclusive base offset, and the within-bucket
    * running sum is a window over ~1/buckets of the corpus per
    * partition. Offsets are exact 64-bit integers — identical on any
    * engine. */
  def packSequences(docs: DataFrame, idCol: String, tokCol: String,
                    seqLen: Long, buckets: Int = 1024): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    def fresh(base: String): String = {
      var n = base
      while (docs.columns.contains(n)) n += "_"
      n
    }
    val hC = fresh("_p_hash"); val bC = fresh("_p_bkt")
    val tape = docs
      .filter(col(tokCol) > 0)
      .withColumn(hC, Dedup.hash60(col(idCol).cast("string")))
      .withColumn(bC, shiftright(col(hC), shift))
    val hist = tape.groupBy(col(bC)).agg(sum(col(tokCol)).as("_t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val bases = hist.scanLeft(0L -> 0L) { case ((_, acc), (b, t)) => b -> (acc + t) }
      .init.zip(hist).map { case ((_, acc), (b, _)) => b -> acc }.toMap
    val w = Window.partitionBy(col(bC)).orderBy(col(hC), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // every bucket present at select time MUST be in the driver-collected
    // histogram — a defaulted base of 0 would silently overlap bucket 0's
    // tape range. A miss means the input's lineage re-evaluated
    // differently (rand-derived ids, mutated source): fail loudly.
    val base = coalesce(element_at(typedLit(bases), col(bC)),
      raise_error(concat(
        lit("packSequences: bucket absent from the driver histogram "),
        lit("(nondeterministic input lineage?): "), col(bC).cast("string")))
        .cast("long"))
    val start = coalesce(sum(col(tokCol)).over(w), lit(0L)) + base
    tape.select(col(idCol).as("doc_id"), col(tokCol).cast("long").as("n_tokens"),
        start.as("start_off"))
      // integer `div`, not `/`: long / long is a double in Spark, and a
      // 100 TB tape's offsets live past float53 exactness
      .withColumn("seq_first", expr(s"start_off div ${seqLen}L"))
      .withColumn("seq_last", expr(s"(start_off + n_tokens - 1) div ${seqLen}L"))
  }

  /** Token-budget selection: keep the greedy prefix of documents ordered
    * by (quality desc, id asc) whose cumulative token count stays within
    * `budget` — i.e. "the best docs that fit the training budget".
    *
    * The semantics are a global ordered prefix, but the implementation
    * never globally sorts the corpus (a single-partition window is the
    * classic scale trap):
    *
    *  1. quantize quality into `buckets` coarse tiers and aggregate token
    *     totals per tier — a tiny histogram (≤ buckets rows) collected to
    *     the driver;
    *  2. every tier strictly above the boundary tier (where the running
    *     total crosses the budget) is kept outright — no ordering needed;
    *  3. only the boundary tier — a ~1/buckets fraction of the corpus —
    *     is sorted (by quality desc, id) to fill the remainder exactly.
    *
    * The boundary-tier sort runs as a single-partition window — that is
    * the deliberate tradeoff: with `buckets` = 1000 the tier holds
    * ~0.1% of the corpus (100 GB of a 100 TB corpus's metadata rows ≈
    * well within one task at a few dozen bytes per row); if a quality
    * distribution is so spiky that one tier stays large, raising
    * `buckets` shrinks the tier proportionally. The alternative — a
    * global sort — shuffles the WHOLE corpus.
    *
    * Tiers are strictly ordered by quality (floor quantization), so the
    * result is exactly the global greedy prefix. Null quality sorts LAST
    * (the `orderBy q desc` nulls-last convention) — null-q docs get the
    * bottom tier, selected only after every scored doc. Output: idCol,
    * tokCol, qCol of the selected documents.
    */
  def tokenBudget(docs: DataFrame, idCol: String, qCol: String, tokCol: String,
                  budget: Long, buckets: Int = 1000): DataFrame = {
    // null → bottom tier (below any finite floor(q*buckets), which is
    // clamped to NullTier+1)
    val NullTier = Int.MinValue
    val scoredTier = least(lit(buckets - 1),
      greatest(lit(NullTier + 1L), floor(col(qCol) * buckets))).cast("int")
    val bucketed = docs.withColumn("_tier",
      when(col(qCol).isNotNull, scoredTier).otherwise(lit(NullTier)))

    val hist = bucketed.groupBy("_tier").agg(sum(col(tokCol)).as("toks"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)(Ordering[Int].reverse) // NOT -x: -Int.MinValue overflows

    var running = 0L
    var boundary: Option[Int] = None
    var aboveTotal = 0L
    hist.foreach { case (tier, toks) =>
      if (boundary.isEmpty) {
        if (running + toks > budget) { boundary = Some(tier); aboveTotal = running }
        else running += toks
      }
    }
    val b = boundary.getOrElse(
      return docs.select(idCol, tokCol, qCol)) // whole corpus fits

    val above = bucketed.filter(col("_tier") > b)
      .select(idCol, tokCol, qCol)
    // only the boundary tier is sorted; `aboveTotal` offsets its cumsum.
    // desc = nulls-last, matching the global ordering when b == NullTier
    val w = Window.partitionBy().orderBy(col(qCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = bucketed.filter(col("_tier") === b)
      .withColumn("_cum", sum(col(tokCol)).over(w) + lit(aboveTotal))
      .filter(col("_cum") <= budget)
      .select(idCol, tokCol, qCol)

    above.unionByName(boundaryKept)
  }

  /** Multi-turn conversation assembly from an interaction log: per user,
    * turns in `orderCol` order, truncated to the LATEST turns whose
    * token total fits `budget` (context-window truncation keeps the
    * recent end — the chat-training convention). Emits per-user example
    * stats plus a deterministic fingerprint of the kept turn sequence
    * (md5-60 of the ordered texts), the dedup/versioning key for
    * assembled examples.
    *
    * Scale: one shuffle on the user key, a user-keyed window (never a
    * global sort), and a per-user aggregate whose collected list is
    * session-sized — the q22 discipline applied to example assembly. */
  /** Assistant-turn LOSS-MASK spans for chat training: number each
    * user's turns in event order (0-based; even = user, odd =
    * assistant — the alternating-roles convention), lay the turns on
    * the per-conversation token tape, and emit one row per ASSISTANT
    * turn with its [tok_s, tok_e) token span — exactly the indices a
    * trainer masks the loss to ("train only on assistant tokens").
    * Flattened to one row per span (not an array column) so the spans
    * are joinable/filterable like any frame.
    *
    * One user-keyed shuffle carries the turn numbering and the
    * exclusive prefix token sum (per-conversation ordering only, never
    * a global sort); token counts use `tok` ([[RegexBpeTokenizer]] by
    * default — the same denominator as [[assembleConversations]]).
    * Output: (user_id, turn_idx, tok_s, tok_e). */
  def assistantSpans(events: DataFrame, userCol: String, orderCol: String,
                     textCol: String,
                     tok: Tokenizer = RegexBpeTokenizer): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ord"))
    events.select(col(userCol).as("user_id"), col(orderCol).as("ord"),
        tok.count(col(textCol)).as("nt"))
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("long"))
      .withColumn("tok_s", coalesce(
        sum(col("nt")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("turn_idx") % 2 === 1)
      .select(col("user_id"), col("turn_idx"), col("tok_s"),
        (col("tok_s") + col("nt")).as("tok_e"))
  }

  def assembleConversations(events: DataFrame, userCol: String,
                            orderCol: String, textCol: String,
                            budget: Long,
                            tok: Tokenizer = RegexBpeTokenizer): DataFrame = {
    val turns = events.select(col(userCol).as("user_id"),
      col(orderCol).as("ord"), col(textCol).as("txt"),
      tok.count(col(textCol)).as("nt"))
    // suffix token sums: cumulative in DESCENDING order = budget measured
    // back from the latest turn
    val wDesc = Window.partitionBy(col("user_id")).orderBy(col("ord").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = turns.withColumn("_ca_cum", sum(col("nt")).over(wDesc))
      .withColumn("_ca_keep", col("_ca_cum") <= budget)
    marked.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_turns"),
      sum(when(col("_ca_keep"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("_ca_keep"), col("nt")).otherwise(0L)).as("n_tokens"),
      min(when(col("_ca_keep"), col("ord"))).as("first_kept"),
      max(when(col("_ca_keep"), col("ord"))).as("last_kept"),
      Dedup.hash60(concat_ws("\u0001",
        transform(
          array_sort(collect_list(when(col("_ca_keep"),
            struct(col("ord"), col("txt"))))),
          s => s.getField("txt")))).as("fp"))
  }

  /** k-anonymity generalization census: assign every row the FINEST
    * quasi-identifier generalization level whose full-corpus group still
    * has ≥ k members. Level L means the last L of `qiCols` are replaced
    * by `"*"`; level-count monotonicity (coarser ⇒ never smaller groups)
    * makes "finest adequate level" well-defined from one census.
    *
    * Spark-first shape: ONE `rollup` aggregation computes every level's
    * group sizes in a single shuffle (level L = grouping id 2^L − 1 —
    * rollup's suffix masks are exactly the generalization ladder), and
    * each level table is ≤ distinct-combo-sized, so the per-level lookups
    * broadcast — the corpus is scanned once and never re-shuffled,
    * 100-TB-safe. Null-safe joins: a NULL QI value is a value, not a
    * rolled-up slot (grouping id disambiguates).
    *
    * Output: idCol, one `<qi>_g` generalized string per QI, `anon_level`,
    * `grp_n` (the assigning level's group size), `kept` (false only when
    * even the all-star group — the whole corpus — is under k). */
  def kAnonymize(docs: DataFrame, idCol: String, qiCols: Seq[String],
                 k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val nQi = qiCols.length
    // localCheckpoint: the census feeds one lookup per ladder level, and
    // without a stage boundary Catalyst re-plans (and re-EXECUTES) the
    // whole rollup once per level — nQi+1 corpus scans instead of one
    // (caught by the PlanQualitySpec Expand-count pin). The checkpointed
    // frame is ≤ distinct-combo-sized.
    val counts = docs
      .rollup(qiCols.map(col): _*)
      .agg(count(lit(1)).as("_ka_n"),
        grouping_id(qiCols.map(col): _*).as("_ka_gid"))
      .localCheckpoint()
    // level L keeps the first nQi−L QIs; rollup's suffix-mask gid is 2^L−1
    val joined = (0 to nQi).foldLeft(docs) { (acc, lvl) =>
      val keep = qiCols.take(nQi - lvl)
      val lvlCounts = counts
        .filter(col("_ka_gid") === ((1L << lvl) - 1L))
        .select(keep.map(c => col(c).as(s"_ka_${lvl}_$c")) :+
          col("_ka_n").as(s"_ka_n_$lvl"): _*)
      val cond = keep.map(c => acc(c) <=> lvlCounts(s"_ka_${lvl}_$c"))
        .reduceOption(_ && _).getOrElse(lit(true))
      acc.join(broadcast(lvlCounts), cond, "left")
        .drop(keep.map(c => s"_ka_${lvl}_$c"): _*)
    }
    val level = (0 to nQi).foldRight(lit(nQi.toLong)) { (lvl, finer) =>
      if (lvl == nQi) finer
      else when(col(s"_ka_n_$lvl") >= k, lit(lvl.toLong)).otherwise(finer)
    }
    val withLvl = joined.withColumn("anon_level", level)
    val grpN = (0 to nQi).foldRight(lit(null).cast("long")) { (lvl, rest) =>
      when(col("anon_level") === lvl, col(s"_ka_n_$lvl")).otherwise(rest)
    }
    val gCols = qiCols.zipWithIndex.map { case (c, i) =>
      // QI i is generalized at levels > nQi−1−i (suffix ladder)
      when(col("anon_level") > (nQi - 1 - i), lit("*"))
        .otherwise(col(c).cast("string")).as(s"${c}_g")
    }
    withLvl.select(col(idCol) +: gCols :+ col("anon_level") :+
      grpN.as("grp_n") :+ (grpN >= k).as("kept"): _*)
  }

  /** Water-filling token-budget allocation across strata (domains,
    * languages, sources): find the integer water level `cap` with
    * Σ_s min(tokens_s, cap) ≤ budget < Σ_s min(tokens_s, cap+1), give
    * every stratum alloc = min(tokens_s, cap), then hand the exact
    * remainder out one token at a time to the unsaturated strata in
    * stratum-name order — Σ alloc == min(budget, Σ tokens), exactly.
    * The mixture primitive for "spend B tokens as evenly as the data
    * allows": small domains keep everything, large domains are capped
    * at a common level (DoReMi-adjacent uniform water-filling).
    *
    * Scale: one corpus-sized aggregation to the per-stratum census;
    * everything after (windows, the cap pick, remainder ranks) runs on
    * ≤ #strata rows — the same bounded-census discipline as
    * [[quotaSample]]. Output per stratum: n_docs, total_tokens, cap,
    * alloc. */
  def waterFillBudget(docs: DataFrame, stratumCol: String, tokCol: String,
                      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val census = docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokCol)).as("total_tokens"))
    // census-sized windows (≤ #strata rows — bounded by design)
    val wAsc = Window.orderBy(col("total_tokens"), col(stratumCol))
    val ranked = census
      .withColumn("_wf_i", row_number().over(wAsc))
      .withColumn("_wf_prefix",
        coalesce(sum(col("total_tokens"))
          .over(wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_wf_prev",
        coalesce(lag(col("total_tokens"), 1).over(wAsc), lit(0L)))
      .withColumn("_wf_s",
        count(lit(1)).over(Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    // candidate level for row i: remaining budget spread over the
    // still-unsaturated strata; valid iff it lands in [prev, total_i).
    // `div` (IntegralDivide), not `/`: the double round-trip is inexact
    // past 2^53 and a water level may not be off by one token
    val leveled = ranked
      .withColumn("_wf_left", greatest(lit(budget) - col("_wf_prefix"), lit(0L)))
      .withColumn("_wf_cand", expr("_wf_left div (_wf_s - _wf_i + 1)"))
      .withColumn("_wf_valid",
        col("_wf_prev") <= col("_wf_cand") &&
          col("_wf_cand") < col("total_tokens"))
    // budget ≥ Σ tokens ⇒ no valid row ⇒ cap = the largest stratum
    val capRow = leveled.agg(
      coalesce(max(when(col("_wf_valid"), col("_wf_cand"))),
        max(col("total_tokens"))).as("cap"))
    val withCap = leveled.crossJoin(broadcast(capRow))
      .withColumn("_wf_alloc0", least(col("total_tokens"), col("cap")))
    // exact remainder: +1 token to the first r unsaturated strata
    val spentRow = withCap.agg(
      (least(lit(budget), sum(col("total_tokens"))) -
        sum(col("_wf_alloc0"))).as("_wf_r"))
    val wUnsat = Window.partitionBy(col("_wf_unsat")).orderBy(col(stratumCol))
    withCap
      .withColumn("_wf_unsat", col("total_tokens") > col("cap"))
      .crossJoin(broadcast(spentRow))
      .withColumn("_wf_urk", row_number().over(wUnsat))
      .withColumn("alloc",
        col("_wf_alloc0") +
          when(col("_wf_unsat") && col("_wf_urk") <= col("_wf_r"), 1L)
            .otherwise(0L))
      .select(col(stratumCol), col("n_docs"), col("total_tokens"),
        col("cap"), col("alloc"))
  }

  /** SOFT-DEDUP sampling — keep each document with probability
    * base/(cluster_size) instead of hard-dropping duplicates: duplicated
    * content stays REPRESENTED (proportionally to its one distinct text,
    * not its copy count) while the corpus keeps natural-variation copies
    * a hard d14 prune would erase. The selection analog of p37's
    * count-duplicates-once accounting.
    *
    * Deterministic: doc kept iff h60(id) mod (k·denom) < num — an exact
    * integer Bernoulli(num/(k·denom)) trial on the md5 grid, so the kept
    * set is engine- and partitioning-stable. One fp-keyed aggregate for
    * cluster sizes + one fp-keyed join back; the trial itself is
    * map-side. Output: kept (id, cluster_size). */
  def softDedupSample(docs: DataFrame, idCol: String, textCol: String,
                      num: Long = 1L, denom: Long = 2L): DataFrame = {
    require(num > 0 && denom >= num, s"keep rate must be in (0,1]: $num/$denom")
    val f = docs.select(col(idCol).as("id"),
      graft.ops.TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val sizes = f.groupBy(col("fp")).agg(count(lit(1)).as("cluster_size"))
    f.join(sizes, Seq("fp"))
      .filter(pmod(graft.ops.Dedup.hash60(col("id").cast("string")),
        col("cluster_size") * lit(denom)) < lit(num))
      .select(col("id"), col("cluster_size"))
  }

  /** DATA-CONSTRAINED epoch plan (the Muennighoff-style repetition
    * budget): spend a token budget across sources where each source can
    * contribute at most `maxEpochs` passes over its UNIQUE content —
    * duplicated text counts once toward capacity (the p37 effective-
    * token floor), and the allocation is [[waterFillBudget]] over the
    * per-source capacities, so over-budget corpora cap evenly instead of
    * proportionally amplifying the biggest crawl. epochs_ppm = how many
    * passes over the unique data the allocation buys, on the 1e-6 grid.
    *
    * Scale shape: one (source, fingerprint) aggregate (map-side collapse
    * of copies), a sources-sized rollup, and the census-sized water-fill
    * windows — nothing corpus-sized after the first aggregate. Output:
    * (source, unique_tokens, capacity, alloc, epochs_ppm). */
  def epochPlan(docs: DataFrame, sourceCol: String, textCol: String,
                budget: Long, maxEpochs: Long = 4L): DataFrame = {
    require(budget >= 0 && maxEpochs > 0, s"bad budget/epochs: $budget/$maxEpochs")
    val uniq = docs.select(col(sourceCol).as("source"),
        graft.ops.TextAnalysis.fingerprint(col(textCol)).as("fp"),
        graft.ops.TextAnalysis.tokenCount(col(textCol)).as("tok"))
      .groupBy(col("source"), col("fp")).agg(max(col("tok")).as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("unique_tokens"))
    val capd = uniq.select(col("source"), col("unique_tokens"),
      (col("unique_tokens") * lit(maxEpochs)).as("capacity"))
    val alloc = waterFillBudget(capd, "source", "capacity", budget)
      .select(col("source"), col("alloc"))
    capd.join(alloc, Seq("source")) // sources-sized both sides
      .select(col("source"), col("unique_tokens"), col("capacity"), col("alloc"),
        expr("CASE WHEN unique_tokens = 0 THEN 0L " +
          "ELSE (alloc * 1000000L) div unique_tokens END").as("epochs_ppm"))
  }

  /** Cluster-balanced (diversity) sampling: spend a document budget as
    * evenly as the EMBEDDING-SPACE structure allows. The SSL-curation
    * step between SemDeDup and stratified sampling — strata you don't
    * have labels for: cluster the corpus with the deterministic k-means
    * codebook ([[Similarity.trainCentroids]]), water-fill the budget
    * across clusters (dense regions are capped at a common water level,
    * sparse regions keep everything — the same integer allocator as
    * [[waterFillBudget]] with unit weights), then select each cluster's
    * quota by id-hash rank ([[quotaSample]]'s tier-bucketed plan).
    *
    * Everything is exact integer math end-to-end (integer k-means,
    * integer water-fill, hash-rank selection), so the kept set is
    * bit-identical across engines and partitionings.
    *
    * Scale shape: codebook training on a sample is O(k·iters·|sample|);
    * the full corpus then pays ONE broadcast-assign scan (the codebook
    * is plan literals — nothing corpus-sized shuffles for assignment),
    * one census aggregation (≤ k rows — the bounded-collect contract for
    * the quota map), and quotaSample's tier-histogram selection. Output:
    * (c_id, id) of the kept rows. */
  def clusterQuotaSample(corpus: DataFrame, idCol: String, budget: Long,
                         nCentroids: Int = 8, iters: Int = 2): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val cents = Similarity.trainCentroids(corpus, nCentroids, iters)
    val assigned = corpus.withColumn("c_id",
      Similarity.centroidBest(cents, col("q"), col("nq")))
    val alloc = waterFillBudget(assigned.withColumn("_cq_one", lit(1L)),
      "c_id", "_cq_one", budget)
    // ≤ nCentroids rows — the bounded-census collect behind every quota map
    val quotas = alloc.select(col("c_id"), col("alloc")).collect()
      .map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    val strat = assigned
      .select(col(idCol), col("c_id"), col("c_id").cast("string").as("_cq_cluster"))
    quotaSample(strat, idCol, "_cq_cluster", quotas, defaultQuota = 0L)
      .select(col("c_id"), col(idCol))
  }
}
