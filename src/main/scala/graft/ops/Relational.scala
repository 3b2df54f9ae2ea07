package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as built-ins, composed scale-first
  * from existing primitives (SURVEY §2.4 note: the reference has no
  * relational layer at all — these extend the engine's own surface).
  */
object Relational {

  /** As-of join (point-in-time lookup): for every left row, the single
    * latest right row with the same key whose time is ≤ the left row's
    * time; ties on time resolved by the largest `rightTieBreak`.
    *
    * Implemented with the union+window technique: tag both sides, union,
    * sort within key by (time, tieBreak) and carry the last non-null
    * right payload forward. ONE shuffle on the key — no range-join blowup
    * (a naive `ON key = key AND rt <= lt` equi+range join explodes to
    * O(|left| × matching |right|) intermediate rows; this stays
    * O(|left| + |right|) and survives 100 TB).
    *
    * Right rows at the same key+time as a left row DO match (≤ semantics):
    * the left row sorts after them via tieBreak = +∞.
    *
    * Returns all `left` columns plus `rightVals` (null when no right row
    * precedes the left row).
    *
    * Keys keep their NATIVE type (string entity ids are the common as-of
    * case — an unconditional cast-to-long would silently null them out);
    * only equality/hashability is needed of the key, so any atomic type
    * works. A right key of a different but castable type is cast to the
    * left key's type; an incompatible key pair fails loudly at plan time.
    */
  def asofJoin(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightTieBreak: String, rightVals: Seq[String]): DataFrame = {

    val lkType = left.schema(leftKey).dataType
    val rkType = right.schema(rightKey).dataType
    val rKey = if (rkType == lkType) col(rightKey) else col(rightKey).cast(lkType)
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(leftKey).as("_k"),
      col(leftTime).cast("long").as("_t"),
      lit(Long.MaxValue).as("_tb"),
      lit(null).cast(right.select(rightVals.map(col): _*).schema).as("_vals"),
      struct(leftCols.map(col): _*).as("_row"))
    val r = right.select(
      rKey.as("_k"),
      col(rightTime).cast("long").as("_t"),
      col(rightTieBreak).cast("long").as("_tb"),
      struct(rightVals.map(col): _*).as("_vals"),
      lit(null).cast(left.schema).as("_row"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_m", last(col("_vals"), ignoreNulls = true).over(w))
      .filter(col("_row").isNotNull)
      .select(leftCols.map(c => col(s"_row.$c").as(c)) ++
        rightVals.map(v => col(s"_m.$v").as(v)): _*)
  }

  /** Interval (range) join via time-bucket decomposition: match every
    * left row with the right rows of the same key whose time lies in
    * `(leftTime + loExcl, leftTime + hiIncl]`. A naive
    * `ON key AND rt > lt+lo AND rt <= lt+hi` plans as an equi-join whose
    * range residual explodes per key (or worse, a nested-loop join); the
    * bucket decomposition replicates each LEFT row into the ~(hi-lo)/bucket
    * time buckets its window spans, joins on `(key, bucket)` — an ordinary
    * hash join — and applies the exact range predicate as a residual
    * filter. Each qualifying pair matches exactly once (the right row's
    * bucket is unique). Right columns come back `rightPrefix`-renamed. */
  def bucketedRangeJoin(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      loExcl: Long, hiIncl: Long, bucket: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(bucket > 0 && hiIncl > loExcl)
    val lb = left.withColumn("_bkt", explode(sequence(
      expr(s"($leftTime + $loExcl) div $bucket"),
      expr(s"($leftTime + $hiIncl) div $bucket"))))
    val rb = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, rightPrefix + c))
      .withColumn("_bkt", expr(s"$rightPrefix$rightTime div $bucket"))
    lb.join(rb,
        lb("_bkt") === rb("_bkt") &&
          col(leftKey) === col(rightPrefix + rightKey) &&
          col(rightPrefix + rightTime) > col(leftTime) + loExcl &&
          col(rightPrefix + rightTime) <= col(leftTime) + hiIncl)
      .drop("_bkt")
  }

  /** Skew-safe equi-join: the left side gets a deterministic salt in
    * [0, salts), the (smaller) right side is replicated once per salt
    * value, and the join runs on (key, salt). A hot key's rows spread
    * over `salts` reducers instead of melting one — the standard fix when
    * AQE's skew-join splitting isn't available (e.g. sort-merge join
    * feeding an aggregation on the same key). Result is exactly the plain
    * equi-join.
    *
    * Broadcast guard: salting exists for the SORT-MERGE case — a right
    * side under the session's broadcast threshold takes a plain
    * broadcast hash join instead (no shuffle to skew, so ×salts
    * replication would be pure overhead). The optimizer's own size
    * estimate decides, driver-side, no job. */
  def saltedJoin(left: DataFrame, leftKey: Column, right: DataFrame,
                 rightKey: Column, saltSource: Column, salts: Int): DataFrame = {
    // no-default get: resolves the session's EFFECTIVE value including
    // Spark's built-in default (a supplied fallback would mask it)
    val thrStr = scala.util.Try(
      right.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold"))
      .getOrElse("-1").trim
    // plain number (incl. -1 = disabled) or a byte-suffixed size string
    val thr = scala.util.Try(thrStr.toLong).getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(thrStr))
    val est = right.queryExecution.optimizedPlan.stats.sizeInBytes
    if (thr > 0 && est <= thr)
      left.join(broadcast(right), leftKey === rightKey)
    else {
      val salted = left.withColumn("_salt", pmod(saltSource.cast("long"), lit(salts.toLong)))
      val replicated = right.withColumn("_salt",
        explode(sequence(lit(0L), lit(salts.toLong - 1))))
      salted.join(replicated,
          salted("_salt") === replicated("_salt") && leftKey === rightKey)
        .drop("_salt")
    }
  }

  /** Connected components over an undirected edge list (a_id, b_id):
    * iterative minimum-label propagation WITH POINTER JUMPING to a
    * fixpoint — each node's label becomes the smallest node id reachable
    * from it. Per round a node takes the min of its own label, its
    * neighbors' labels, and its label's label (the label-of-label
    * shortcut doubles the propagation distance every round — path
    * doubling), so the loop runs O(log diameter) joins instead of
    * O(diameter): a 10-million-hop near-dup chain converges in ~24
    * rounds, not 10 million. `localCheckpoint` truncates the lineage
    * every iteration so plans stay flat no matter how many rounds run
    * (the classic iterative-Spark failure mode is an exponentially
    * deepening plan). Every intermediate checkpoint is UNPERSISTED
    * before returning (only the eagerly-materialized result stays
    * cached) — otherwise each call pins O(iterations) RDD copies in
    * executor memory for the session, a real leak in a long-running
    * driver. Output: (node, cluster, cluster_size).
    *
    * This is the canonical "assign one keeper per near-dup cluster" step
    * after pairwise dedup at scale. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          localEdgeThreshold: Long = 1000000L): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    val tracked = scala.collection.mutable.Buffer.empty[Int]
    def cp(df: DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet
      val r = df.localCheckpoint()
      tracked ++= (sc.getPersistentRDDs.keySet -- before)
      r
    }

    val sym = cp(edges.select(col("a_id").cast("long").as("src"), col("b_id").cast("long").as("dst"))
      .union(edges.select(col("b_id").cast("long").as("src"), col("a_id").cast("long").as("dst")))
      .distinct())

    val spark = edges.sparkSession
    val e = sym.count()

    // BOUNDED-GRAPH fast path (the rank loops' contract): the fixpoint —
    // every node labeled with its component's MINIMUM id — is unique, so
    // a driver-local union-find (smaller root wins, hence root = the
    // component minimum) returns the identical answer without
    // O(log diameter) rounds of graph-sized joins and their scheduling
    // floor. The corpus-sized work (pair generation) already ran
    // distributed in the caller; a genuinely large edge set keeps the
    // distributed pointer-jumping loop.
    if (e <= localEdgeThreshold) {
      import spark.implicits._
      val es = sym.select(col("src"), col("dst")).as[(Long, Long)].collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (s, d) =>
        if (!parent.contains(s)) parent(s) = s
        if (!parent.contains(d)) parent(d) = d
        val rs = find(s); val rd = find(d)
        if (rs != rd) { if (rs < rd) parent(rd) = rs else parent(rs) = rd }
      }
      val byRoot = parent.keysIterator.map(n => (n, find(n))).toIndexedSeq
      val sizes = byRoot.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val out = byRoot.map { case (n, c) => (n, c, sizes(c)) }
      val intermediates = tracked.toSet
      intermediates.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      return spark.createDataset(out).toDF("node", "cluster", "cluster_size")
    }

    var labels = cp(sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")))
    // The loop's frames are GRAPH-bounded, not corpus-bounded — the
    // corpus-sized work (building the edge list) ran under the caller's
    // partitioning when `sym` materialized. Same discipline as the rank
    // loops: census-scaled shuffle partitions (a 1 000-pair near-dup
    // graph on 32 session partitions makes each of the ~4 shuffles per
    // round pure scheduling), AQE off inside the loop (its stage-by-
    // stage materialization is tax at an exactly-derived partition
    // count), both restored in finally.
    val loopParts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      e / 200000L + 1L)).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var iter = 0
    var converged = false
    try {
      while (!converged && iter < maxIter) {
        val prop = sym.join(labels, col("src") === col("node"))
          .groupBy(col("dst")).agg(min(col("lbl")).as("nbr"))
        // pointer jump: lbl(lbl(node)) — labels only ever decrease toward
        // the component minimum, so the shortcut preserves the fixpoint
        val jump = labels.select(col("node").as("_j_node"), col("lbl").as("_j_lbl"))
        // the convergence signal rides the SAME action as the checkpoint
        // (localCheckpoint fulfills observe metrics): one job per round,
        // no separate old-vs-new join + isEmpty action
        val obs = org.apache.spark.sql.Observation()
        val next = cp(labels
          .join(prop, col("node") === col("dst"), "left")
          .join(jump, col("lbl") === col("_j_node"), "left")
          .select(col("node"), col("lbl"), least(
            col("lbl"),
            least(coalesce(col("nbr"), col("lbl")),
              coalesce(col("_j_lbl"), col("lbl")))).as("nl"))
          .select(col("node"), col("nl"), (col("nl") =!= col("lbl")).as("_chg"))
          .observe(obs, count(when(col("_chg"), 1)).as("changed")))
        converged = obs.get("changed").asInstanceOf[Long] == 0L
        labels = next.select(col("node"), col("nl").as("lbl"))
        iter += 1
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    // silent wrong labels are worse than a loud stop: a non-converged run
    // would get SPLIT keeper assignments
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations — " +
          "with pointer jumping this needs O(log diameter) rounds; raise maxIter")
    val sizes = labels.groupBy(col("lbl").as("_l")).agg(count(lit(1)).as("cluster_size"))
    // materialize the result, then release every intermediate checkpoint
    val intermediates = tracked.toSet
    val result = cp(labels.join(sizes, col("lbl") === col("_l"))
      .select(col("node"), col("lbl").as("cluster"), col("cluster_size")))
    intermediates.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    result
  }

  /** Fixed-point PageRank over a weighted directed graph — the link/
    * transition-graph authority score (domain rank for web-corpus
    * curation, item rank for behavioral graphs). `edges` = (src, dst, w)
    * with long node ids and positive long weights; `nodes` = (item), the
    * full vertex set (vertices with no edges still hold rank mass).
    *
    * All arithmetic is INTEGER fixed-point so the result is bit-identical
    * across engines and partitionings (the [[graft.ops.Sampling]]
    * quantize-then-integer-fold discipline applied to an iterative
    * algorithm — float PageRank sums in shuffle order and can never
    * hash-match an oracle):
    *   - ranks live on a 1e-12 grid (SCALE), transition probabilities on
    *     a 1e-6 grid (PSCALE), both truncating `div`;
    *   - per-edge contribution = (r_src * p_e) div PSCALE, bounded by
    *     SCALE·PSCALE = 1e18 < 2^63 REGARDLESS of corpus size — the
    *     probabilities are precomputed ONCE outside the loop, so the
    *     per-iteration multiply never sees a raw corpus-scale count
    *     (p_e requires w·PSCALE < 2^63 ⇒ outdegree < 9.2e12 events per
    *     node, checked loudly);
    *   - new_r = (3·SCALE) div (20·N)  +  17·(in_sum + dang div N) div 20
    *     — damping 0.85 as the exact rational 17/20, dangling mass
    *     redistributed uniformly.
    *
    * Scale shape: the edge frame shuffles ONCE to aggregate weights and
    * once to build probabilities; each iteration is one join of ranks
    * (vertex-sized) against edges on src + one dst-keyed aggregate — the
    * textbook distributed PageRank step. `localCheckpoint` per iteration
    * keeps the plan flat (same discipline as [[connectedComponents]]);
    * the dangling scalar rides a broadcast 1-row crossJoin, never a
    * driver collect. Output: (item, pr_q) with pr_q on the SCALE grid,
    * Σ pr_q ≈ SCALE (truncation drops ≤ a few units per vertex).
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iterations: Int = 10,
               localEdgeThreshold: Long = 1000000L,
               localVertexThreshold: Long = 100000L): DataFrame =
    personalizedPageRank(edges, nodes, nodes.select(col("item")), iterations,
      localEdgeThreshold, localVertexThreshold)

  /** PERSONALIZED PageRank (TrustRank): teleport and dangling mass
    * return only to the SEED set, so rank measures proximity-weighted
    * trust flowing out of curated seeds — the classic spam-demotion /
    * domain-authority prior for web-corpus curation (seeds = vetted
    * domains; pages reachable only from spam farms keep ~zero rank).
    * Uniform [[pageRank]] is the special case seeds = all vertices; the
    * same integer grids, overflow bounds, and census-scaled loop apply
    * (see pageRank). Non-seed vertices start at 0 and earn rank only
    * through in-links. Output: (item, pr_q). */
  def personalizedPageRank(edges: DataFrame, nodes: DataFrame,
                           seeds: DataFrame, iterations: Int = 10,
                           localEdgeThreshold: Long = 1000000L,
                           localVertexThreshold: Long = 100000L): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    val tracked = scala.collection.mutable.Buffer.empty[Int]
    def cp(df: DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet
      val r = df.localCheckpoint()
      tracked ++= (sc.getPersistentRDDs.keySet -- before)
      r
    }

    val seedSet = seeds.select(col("item").cast("long").as("item")).distinct()
      .withColumn("is_seed", lit(true))
    val vertices = cp(nodes.select(col("item").cast("long").as("item")).distinct()
      .join(seedSet, Seq("item"), "left")
      .withColumn("is_seed", coalesce(col("is_seed"), lit(false))))
    val n = vertices.filter(col("is_seed")).count()
    require(n > 0, "personalizedPageRank needs a non-empty seed set within the vertex set")
    val ew = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
    // outd is consumed EVERY iteration (dangling anti-join) — without its
    // own stage boundary the caller's corpus-sized edge derivation
    // re-executes 10× (the p31 one-census-many-consumers lesson; measured
    // ~4 s of the 6.4 s first cut of this operator)
    val outd = cp(ew.groupBy(col("src")).agg(sum(col("w")).as("outdeg")))
    // fail loudly (not wrap) if a node's outdegree would overflow w·PSCALE
    val pe = cp(ew.join(outd, "src")
      .select(col("src"), col("dst"), expr(
        "CASE WHEN outdeg >= 9223372036854L THEN " +
          "raise_error('pageRank: outdegree too large for the 1e-6 probability grid') " +
          "ELSE (w * 1000000L) div outdeg END").as("p")))
    val base = (3L * 1000000000000L) / (20L * n)

    // The loop's frames are GRAPH-bounded (vertices/edges), not corpus-
    // bounded — the corpus-sized work (building the edge aggregate)
    // already ran under the caller's partitioning when `pe` materialized.
    // Shuffling a 100-node rank frame across the session's full
    // partition count makes every one of the ~3 shuffles per iteration
    // pure scheduling overhead (measured 6.4 s → the census-scaled
    // setting below; capped at the session value, so a billion-edge
    // graph on a real cluster keeps the cluster-sized setting).
    val e = pe.count()
    val vCount = vertices.count()
    val spark = edges.sparkSession

    // BOUNDED-GRAPH fast path: every per-iteration quantity is exact
    // integer fixed-point (truncating div grids, order-free integer
    // sums), so a driver-local loop is BIT-IDENTICAL to the distributed
    // one — and a vocab/item-sized graph pays ~10 iterations × ~3
    // shuffles of pure scheduling floor in the distributed loop for
    // nothing (t30's residual 5 s was ENTIRELY this). The corpus-sized
    // work (edge aggregate → outd, pe) already ran distributed above; a
    // genuinely large graph (> the broadcast-class bound below) keeps
    // the textbook distributed iteration.
    if (vCount <= localVertexThreshold && e <= localEdgeThreshold) {
      import spark.implicits._
      val vtx = vertices.select(col("item"), col("is_seed"))
        .as[(Long, Boolean)].collect()
      val pes = pe.select(col("src"), col("dst"), col("p"))
        .as[(Long, Long, Long)].collect()
      val m = vtx.length
      val idx = new java.util.HashMap[Long, Integer](m * 2)
      var i = 0
      while (i < m) { idx.put(vtx(i)._1, i); i += 1 }
      // has_out mirrors the distributed ranks frame: a vertex is
      // non-dangling iff it appears as src of ANY edge (even one whose
      // dst is outside the vertex set — that edge still consumed
      // transition probability when pe was built)
      val hasOut = new Array[Boolean](m)
      pes.foreach { case (s, _, _) =>
        val si = idx.get(s); if (si != null) hasOut(si) = true
      }
      val r = new Array[Long](m)
      i = 0
      while (i < m) { if (vtx(i)._2) r(i) = 1000000000000L / n; i += 1 }
      var it = 0
      while (it < iterations) {
        // in_sum: per-edge (r_src * p) div 1e6, summed per dst — edges
        // whose src has no rank row contribute nothing, edges whose dst
        // is outside the vertex set drop, exactly as the joins do
        val inSum = new Array[Long](m)
        pes.foreach { case (s, d, p) =>
          val si = idx.get(s); val di = idx.get(d)
          if (si != null && di != null)
            inSum(di) += (r(si) * p) / 1000000L
        }
        var dang = 0L
        i = 0
        while (i < m) { if (!hasOut(i)) dang += r(i); i += 1 }
        val dShare = dang / n
        i = 0
        while (i < m) {
          r(i) =
            if (vtx(i)._2) base + (17L * (inSum(i) + dShare)) / 20L
            else (17L * inSum(i)) / 20L
          i += 1
        }
        it += 1
      }
      val out = vtx.indices.map(j => (vtx(j)._1, r(j)))
        .sortBy { case (item, pr) => (-pr, item) }
      val intermediates = tracked.toSet
      intermediates.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      return spark.createDataset(out).toDF("item", "pr_q")
    }
    val loopParts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      math.max(vCount, e) / 200000L + 1L)).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    // AQE materializes every shuffle as its own query stage to re-plan on
    // runtime stats — pure per-stage scheduling tax here, since the loop's
    // frames are graph-sized with a partition count WE just derived from
    // exact counts (nothing for AQE to learn). On a vocab-sized graph the
    // 10-iteration loop is ~6 shuffles per checkpointed action; stage-by-
    // stage execution made it scheduling-bound (measured ~2× wall on t30).
    // The caller's corpus-sized work (edge aggregate) already ran under
    // the session's AQE before pe/outd materialized.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // The ranks frame is VERTEX-COMPLETE and carries both per-vertex
      // flags (is_seed, has_out), so one frame serves all three per-
      // iteration consumers: the in-sum join, the dangling sum (a plain
      // filter+agg — no anti-join against outd), and the next-rank
      // left join (no re-join against vertices). Checkpointing EVERY
      // round keeps each action's plan one iteration deep; with three
      // consumers per level, any longer cadence multiplies the subtree
      // 3^k per un-checkpointed level (measured: cadence 5 was 2.2×
      // cadence 1 on the t30 graph).
      var ranks = cp(vertices
        .join(outd.select(col("src").as("item"), lit(true).as("has_out")),
          Seq("item"), "left")
        .select(col("item"), col("is_seed"),
          coalesce(col("has_out"), lit(false)).as("has_out"),
          when(col("is_seed"), lit(1000000000000L / n)).otherwise(lit(0L)).as("r")))
      (1 to iterations).foreach { _ =>
        val in = pe.join(ranks.select(col("item"), col("r")),
            pe("src") === col("item"))
          .groupBy(col("dst")).agg(sum(expr("(r * p) div 1000000L")).as("in_sum"))
        val dang = ranks.filter(!col("has_out"))
          .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
        val next = ranks.select(col("item"), col("is_seed"), col("has_out"))
          .join(in, col("item") === in("dst"), "left")
          .crossJoin(broadcast(dang))
          .select(col("item"), col("is_seed"), col("has_out"), expr(
            s"CASE WHEN is_seed THEN ${base}L + " +
              s"(17L * (coalesce(in_sum, 0L) + (dang div ${n}L))) div 20L " +
              "ELSE (17L * coalesce(in_sum, 0L)) div 20L END").as("r"))
        ranks = cp(next)
      }
      val intermediates = tracked.toSet
      val result = ranks.select(col("item"), col("r").cast("long").as("pr_q"))
        .orderBy(col("pr_q").desc, col("item")).localCheckpoint()
      intermediates.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      result
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** BOT/AUTOMATION census — users whose inter-arrival gaps are too
    * regular to be human: scripted traffic arrives on a timer, so one
    * gap value dominates its distribution. Behavioral logs feeding a
    * training pipeline need this gate the way text needs a boilerplate
    * filter — bot sessions poison co-visitation, transition, and funnel
    * statistics (they ARE the hub sessions q31 caps away, detected at
    * the source).
    *
    * Per user: consecutive-event gaps (one user-keyed window, never a
    * global sort), then the gap distribution's modal share on the 1e-6
    * grid — all integer. A user flags when it has ≥ `minGaps` gaps and
    * the modal gap covers ≥ `shareThreshold` ppm. Output (flagged users
    * only): (user_id, n_gaps, n_distinct_gaps, top_share_ppm).
    *
    * Scale shape: one user-keyed window pass + two aggregates, the
    * second keyed on (user, gap) with map-side partials; output is
    * flagged-users-sized. */
  def botCensus(events: DataFrame, userCol: String, orderCol: String,
                tsSecCol: String, minGaps: Long = 5L,
                shareThreshold: Long = 800000L): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("o"))
    val gaps = events.select(col(userCol).as("u"), col(orderCol).as("o"),
        col(tsSecCol).as("ts"))
      .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
      .filter(col("gap").isNotNull)
    gaps.groupBy(col("u"), col("gap")).agg(count(lit(1)).as("c"))
      .groupBy(col("u"))
      .agg(sum(col("c")).as("n_gaps"),
        count(lit(1)).as("n_distinct_gaps"),
        max(col("c")).as("top_c"))
      .withColumn("top_share_ppm", expr("(top_c * 1000000L) div n_gaps"))
      .filter(col("n_gaps") >= minGaps &&
        col("top_share_ppm") >= shareThreshold)
      .select(col("u").as("user_id"), col("n_gaps"),
        col("n_distinct_gaps"), col("top_share_ppm"))
  }

  /** MARKOV (removal-effect) attribution — the data-driven upgrade of
    * q24's last-touch heuristic: model user journeys as a first-order
    * Markov chain (START → events → CONV at the first conversion, or
    * NULL when the journey ends unconverted), and credit each channel by
    * how much the chain's conversion probability DROPS when that channel
    * is switched off (visits to it absorb to nothing). The standard
    * multi-touch attribution model, exactly computable.
    *
    * All-integer semantics: transition probabilities on the 1e-6 grid
    * (truncating div), state values on the 1e-12 grid, `iters` rounds of
    * the absorbing-chain fixed point p(s) = Σ p(t)·pr(s→t) — monotone
    * from 0, so the result is the ≤ iters-step conversion probability,
    * bit-identical across engines. Removing channel c = forcing every
    * read of p(c) to zero inside the iteration (no new matrices).
    *
    * Scale shape: journeys truncate at the first conversion inside ONE
    * user-keyed window pass; transition counts aggregate map-side to a
    * (types+2)²-bounded matrix — the ONLY corpus-sized work. The chain
    * itself is solved in exact driver arithmetic over that tiny matrix
    * (the bounded-collect contract: the matrix is codebook-sized by
    * construction). Output: (channel, p_full_q, p_removed_q, removal_q),
    * removal_q = (P − P₋c)·1e6 div P. */
  def markovAttribution(events: DataFrame, userCol: String, orderCol: String,
                        typeCol: String, convType: String = "purchase",
                        iters: Int = 12): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("o"))
    val uw = Window.partitionBy(col("u"))
    val ev = events.select(col(userCol).as("u"), col(orderCol).as("o"),
      col(typeCol).as("t"))
    val kept = ev.withColumn("cut",
        min(when(col("t") === convType, col("o"))).over(uw))
      .filter(col("cut").isNull || col("o") <= col("cut"))
    val lagged = kept
      .withColumn("prev", lag(col("t"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .withColumn("mo", max(col("o")).over(uw))
    val inner = lagged.select(
      when(col("rn") === 1, lit("START")).otherwise(col("prev")).as("src"),
      col("t").as("dst"))
    val nulls = lagged.filter(col("o") === col("mo") && col("t") =!= convType)
      .select(col("t").as("src"), lit("NULL").as("dst"))
    val eg = inner.unionByName(nulls)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    // (types+2)²-bounded collect — the transition matrix IS codebook-sized
    val edges = eg.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val pr = edges.map { case (s, t, n) => (s, t) -> (n * 1000000L / out(s)) }.toMap
    val states = out.keys.toSeq.sorted
    val bySrc = edges.groupBy(_._1)
    def solve(removed: Option[String]): Long = {
      var p = states.map(_ -> 0L).toMap
      (1 to iters).foreach { _ =>
        p = states.map { s =>
          s -> bySrc(s).map { case (_, t, _) =>
            val pt =
              if (t == convType) 1000000000000L
              else if (t == "NULL" || removed.contains(t)) 0L
              else p.getOrElse(t, 0L)
            pt * pr((s, t)) / 1000000L
          }.sum
        }.toMap
      }
      p.getOrElse("START", 0L)
    }
    val pFull = solve(None)
    val channels = states.filterNot(_ == "START").sorted
    val spark = events.sparkSession
    import spark.implicits._
    channels.map { c =>
      val pc = solve(Some(c))
      (c, pFull, pc,
        if (pFull == 0L) 0L else (pFull - pc) * 1000000L / pFull)
    }.toDF("channel", "p_full_q", "p_removed_q", "removal_q")
      .orderBy(col("channel"))
  }

  /** CO-VISITATION item-item similarity: for every item, the top-k items
    * most often sharing a session with it — the classic collaborative-
    * filtering neighbor build (and, over a web corpus, the co-citation
    * structure a curation pipeline mines). `events` must already carry a
    * session assignment (userCol, sessCol — the s04/q27 1h-gap
    * sessionization); items co-visit when they appear in the SAME
    * session, each session counted once per pair (distinct items).
    *
    * Scale shape: one (user, session)-keyed aggregate collapses events
    * to sorted distinct-item arrays; sessions larger than
    * `maxSessionItems` are DROPPED before the pair explode (bot/crawler
    * sessions are the hub shingles of co-visitation — the df-cap
    * discipline), so the quadratic term is capped at cap²/2 per session;
    * pairs generate MAP-SIDE from the arrays (never a self-join), one
    * (a, b)-keyed count, and the per-item top-k rides the bounded-heap
    * aggregate. Pairs normalize a < b via the sorted array, so counts
    * are partition-order-free. Output: (item, nb, co_n, rk). */
  def coVisitation(events: DataFrame, userCol: String, sessCol: String,
                   itemCol: String, k: Int = 5,
                   maxSessionItems: Int = 20): DataFrame = {
    val sets = events.filter(col(itemCol).isNotNull)
      .groupBy(col(userCol), col(sessCol))
      .agg(array_sort(collect_set(col(itemCol))).as("items"))
      .filter(size(col("items")).between(2, maxSessionItems))
    val pairs = sets.select(explode(flatten(transform(
        sequence(lit(1), size(col("items")) - 1),
        i => transform(sequence(i + 1, size(col("items"))),
          j => struct(element_at(col("items"), i).as("a"),
            element_at(col("items"), j).as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val c = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val sym = c.select(col("a").as("item"), col("b").as("nb"), col("n"))
      .unionByName(c.select(col("b").as("item"), col("a").as("nb"), col("n")))
    sym.groupBy(col("item"))
      .agg(graft.expr.hfunctions.topk_by(col("n").cast("double"), col("nb"), k).as("top"))
      .select(col("item"), explode(col("top")).as("t"))
      .select(col("item"), col("t.n_id").as("nb"),
        col("t.sim").cast("long").as("co_n"), col("t.rk").as("rk"))
  }

  /** BURST detection over an event log: time buckets where a type's
    * event count spikes to ≥ `factor`× its own floor-mean bucket rate —
    * the traffic-anomaly / trending-topic census (run over crawl logs it
    * flags the scrape storms a curation pipeline should down-weight).
    *
    * All-integer semantics so both engines agree bit-for-bit: the
    * per-type mean is the FLOOR mean (total div active-buckets, clamped
    * ≥ 1), the spike ratio lands on the 1e-6 grid via truncating div —
    * n·1e6 stays < 2⁶³ for any corpus under ~9.2e12 events per
    * (type, bucket), no guard needed.
    *
    * Scale shape: ONE events-sized shuffle to the (type, bucket) census
    * (map-side combined); everything after is census-sized — the totals
    * frame is types-sized and rides back as an explicit broadcast.
    * Output: (event_type, bucket, n, ratio_q), bursts only. */
  def burstCensus(events: DataFrame, typeCol: String, tsSecCol: String,
                  bucketSecs: Long = 3600L, factor: Long = 2L): DataFrame =
    burstFromCounts(events.select(col(typeCol).as("event_type"),
        expr(s"$tsSecCol div ${bucketSecs}L").as("bucket"))
      .groupBy(col("event_type"), col("bucket")).agg(count(lit(1)).as("n")),
      factor)

  /** The burst formula on an already-built (event_type, bucket, n)
    * census — shared by the batch operator above and the streaming
    * monitor ([[graft.streaming.StreamBurst]]), whose drained counters
    * arrive pre-aggregated (re-expanding a census to rows to reuse the
    * row-level operator would be stream-length-sized — the s29
    * psiFromCounts lesson). */
  def burstFromCounts(census: DataFrame, factor: Long = 2L): DataFrame = {
    val totals = census.groupBy(col("event_type"))
      .agg(sum(col("n")).as("total_n"), count(lit(1)).as("buckets_active"))
    census.join(broadcast(totals), Seq("event_type"))
      .withColumn("mean_f", expr("greatest(total_n div buckets_active, 1L)"))
      .filter(col("n") >= lit(factor) * col("mean_f"))
      .select(col("event_type"), col("bucket"), col("n"),
        expr("(n * 1000000L) div mean_f").as("ratio_q"))
  }

  /** SALSA hub/authority scores over a weighted directed graph — the
    * stochastic (random-walk) variant of HITS, the link-analysis score
    * behind "who-to-follow"-style ranking. Unlike HITS, each step is a
    * PROBABILITY-normalized walk (authority mass moves backward over a
    * hub's out-distribution, hub mass forward over an authority's
    * in-distribution), so scores are L1-stable without a normalization
    * pass — which is what makes an exact integer fixed-point iteration
    * possible at all (HITS' L2 normalization has no rational form).
    *
    * Update (per iteration, mirroring [[personalizedPageRank]]'s grids —
    * scores on the 1e-12 grid, transition probabilities on 1e-6):
    *   h'(j) = Σ_{j→i} (a(i) · p_in(j,i))  div 1e6,  p_in  = w·1e6 div indeg_w(i)
    *   a'(i) = Σ_{j→i} (h'(j) · p_out(j,i)) div 1e6, p_out = w·1e6 div outdeg_w(j)
    * Restricted to the edge-incident bipartite graph, every authority has
    * in-mass and every hub out-mass, so there is NO dangling term; total
    * mass is conserved up to grid truncation.
    *
    * Scale shape: both probability frames are built ONCE (two edge
    * shuffles total, as in pageRank); each iteration is two edge⋈score
    * joins + two keyed aggregates — everything graph-bounded, run under
    * the same census-scaled partition count and alternating
    * localCheckpoint discipline as pageRank. Output: (item, auth_q,
    * hub_q), zero where the node lacks the role.
    */
  def salsa(edges: DataFrame, iterations: Int = 5,
            localEdgeThreshold: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    val sc = spark.sparkContext
    val tracked = scala.collection.mutable.Buffer.empty[Int]
    def cp(df: DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet
      val r = df.localCheckpoint()
      tracked ++= (sc.getPersistentRDDs.keySet -- before)
      r
    }
    // callers pass (src, dst, w) already unique per edge (as pageRank)
    val ew = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
    val guard = (deg: String) =>
      s"CASE WHEN $deg >= 9223372036854L THEN " +
        "raise_error('salsa: degree too large for the 1e-6 probability grid') " +
        s"ELSE (w * 1000000L) div $deg END"
    val outd = ew.groupBy(col("src")).agg(sum(col("w")).as("outdeg"))
    val ind = ew.groupBy(col("dst")).agg(sum(col("w")).as("indeg"))
    // both probability frames materialize once; the loop only joins them
    val pout = cp(ew.join(outd, "src")
      .select(col("src"), col("dst"), expr(guard("outdeg")).as("p")))
    val pin = cp(ew.join(ind, "dst")
      .select(col("src"), col("dst"), expr(guard("indeg")).as("p")))
    val auths = cp(ew.select(col("dst").as("item")).distinct())
    val nA = auths.count()
    require(nA > 0, "salsa needs a non-empty edge set")
    val e = ew.count()

    // BOUNDED-GRAPH fast path (same contract as personalizedPageRank's):
    // the iteration is exact integer fixed-point, so a driver-local loop
    // is bit-identical and skips ~2 joins × iterations of scheduling
    // floor; the corpus-sized edge aggregation above stays distributed,
    // and a genuinely large graph keeps the distributed loop.
    if (e <= localEdgeThreshold) {
      import spark.implicits._
      val pinE = pin.select(col("src"), col("dst"), col("p"))
        .as[(Long, Long, Long)].collect()
      val poutE = pout.select(col("src"), col("dst"), col("p"))
        .as[(Long, Long, Long)].collect()
      val a0 = auths.select(col("item")).as[Long].collect()
      var a = scala.collection.mutable.HashMap.empty[Long, Long]
      a0.foreach(i => a(i) = 1000000000000L / nA)
      var h = scala.collection.mutable.HashMap.empty[Long, Long]
      for (_ <- 1 to iterations) {
        // key sets mirror the joins exactly: an entry exists iff the
        // vertex had ≥1 edge whose counterpart held rank this half-step
        // (even when the truncating div makes its contribution 0)
        val hN = scala.collection.mutable.HashMap.empty[Long, Long]
        pinE.foreach { case (s, d, p) =>
          a.get(d).foreach(r => hN(s) = hN.getOrElse(s, 0L) + (r * p) / 1000000L)
        }
        h = hN
        val aN = scala.collection.mutable.HashMap.empty[Long, Long]
        poutE.foreach { case (s, d, p) =>
          h.get(s).foreach(r => aN(d) = aN.getOrElse(d, 0L) + (r * p) / 1000000L)
        }
        a = aN
      }
      val out = (a.keySet ++ h.keySet).toSeq
        .map(i => (i, a.getOrElse(i, 0L), h.getOrElse(i, 0L)))
        .sortBy { case (i, aq, _) => (-aq, i) }
      val intermediates = tracked.toSet
      intermediates.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      return spark.createDataset(out).toDF("item", "auth_q", "hub_q")
    }

    val loopParts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      e / 200000L + 1L)).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    // same rationale as personalizedPageRank: graph-sized loop frames at
    // an exactly-derived partition count — AQE's stage-by-stage
    // materialization is pure scheduling tax inside the loop
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      var a = cp(auths.withColumn("r", lit(1000000000000L / nA)))
      var h: DataFrame = null
      (1 to iterations).foreach { i =>
        val hNext = pin.join(a, pin("dst") === a("item"))
          .groupBy(pin("src").as("item"))
          .agg(sum(expr("(r * p) div 1000000L")).as("r"))
        h = if (i % 2 == 0 || i == iterations) cp(hNext) else hNext
        val aNext = pout.join(h, pout("src") === h("item"))
          .groupBy(pout("dst").as("item"))
          .agg(sum(expr("(r * p) div 1000000L")).as("r"))
        a = if (i % 2 == 0 || i == iterations) cp(aNext) else aNext
      }
      val intermediates = tracked.toSet
      val result = a.select(col("item"), col("r").as("auth_q"))
        .join(h.select(col("item"), col("r").as("hub_q")), Seq("item"), "full_outer")
        .select(col("item"),
          coalesce(col("auth_q"), lit(0L)).as("auth_q"),
          coalesce(col("hub_q"), lit(0L)).as("hub_q"))
        .orderBy(col("auth_q").desc, col("item")).localCheckpoint()
      intermediates.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      result
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
