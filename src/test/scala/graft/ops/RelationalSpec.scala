package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** connectedComponents must converge in O(log diameter) rounds (pointer
  * jumping) — a long chain is the adversarial case for plain label
  * propagation — and must refuse to return non-converged labels. */
class RelationalSpec extends SparkSpec {

  private def chain(n: Int) = {
    import spark.implicits._
    (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a_id", "b_id")
  }

  test("a 300-hop chain converges within the default 25 iterations (log d, not d)") {
    val cc = Relational.connectedComponents(chain(300))
    val rows = cc.collect()
    assert(rows.length == 300)
    assert(rows.forall(_.getLong(1) == 0L), "every node labels to the component min")
    assert(rows.forall(_.getLong(2) == 300L))
  }

  test("two components keep distinct min labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val m = Relational.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == (1L, 3L) && m(2L) == (1L, 3L) && m(3L) == (1L, 3L))
    assert(m(10L) == (10L, 2L) && m(11L) == (10L, 2L))
  }

  test("non-convergence throws instead of returning split labels") {
    // localEdgeThreshold = 0 forces the distributed loop — the local
    // union-find always converges, so the contract under test is the
    // distributed path's
    val e = intercept[IllegalStateException] {
      Relational.connectedComponents(chain(100), maxIter = 2, localEdgeThreshold = 0L)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("bounded-graph fast paths are bit-identical to the distributed loops") {
    import spark.implicits._
    // a deliberately lopsided graph: chain + star + dangling + isolated
    val ccEdges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L))).toDF("a_id", "b_id")
    val ccFast = Relational.connectedComponents(ccEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val ccDist = Relational.connectedComponents(ccEdges, localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(ccFast == ccDist)

    val prEdges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L), (1L, 3L, 1L),
      (4L, 1L, 5L)).toDF("src", "dst", "w")
    val prNodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("item") // 5 is isolated (dangling)
    val prFast = Relational.pageRank(prEdges, prNodes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val prDist = Relational.pageRank(prEdges, prNodes, localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(prFast == prDist, s"pageRank fast/distributed diverged:\n$prFast\n$prDist")

    val seeds = Seq(1L).toDF("item")
    val pprFast = Relational.personalizedPageRank(prEdges, prNodes, seeds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val pprDist = Relational.personalizedPageRank(prEdges, prNodes, seeds,
        localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(pprFast == pprDist)

    val saEdges = Seq((1L, 2L, 2L), (1L, 3L, 1L), (4L, 2L, 1L), (5L, 6L, 3L))
      .toDF("src", "dst", "w")
    val saFast = Relational.salsa(saEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val saDist = Relational.salsa(saEdges, localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(saFast == saDist, s"salsa fast/distributed diverged:\n$saFast\n$saDist")
  }

  // ---- pageRank ----

  private def pr(edges: Seq[(Long, Long, Long)], nodes: Seq[Long], iters: Int = 10) = {
    import spark.implicits._
    Relational.pageRank(edges.toDF("src", "dst", "w"), nodes.toDF("item"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank: symmetric 2-cycle splits mass evenly and conserves ~SCALE") {
    val m = pr(Seq((1L, 2L, 1L), (2L, 1L, 1L)), Seq(1L, 2L))
    assert(m(1L) == m(2L), "symmetric graph must give equal ranks")
    val total = m.values.sum
    // truncating div drops at most a few units per node per iteration
    assert(total <= 1000000000000L && total > 1000000000000L - 1000L, s"mass $total")
  }

  test("pageRank: a sink fed by everyone outranks its feeders") {
    // 1→3, 2→3, 3 dangles (its mass redistributes uniformly)
    val m = pr(Seq((1L, 3L, 1L), (2L, 3L, 1L)), Seq(1L, 2L, 3L))
    assert(m(3L) > m(1L) && m(3L) > m(2L))
    assert(m(1L) == m(2L), "symmetric feeders tie")
  }

  test("pageRank: edge weights steer rank (heavier edge, higher rank)") {
    // 1 links to 2 with weight 9 and to 3 with weight 1
    val m = pr(Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)), Seq(1L, 2L, 3L))
    assert(m(2L) > m(3L))
  }

  test("pageRank: isolated vertex keeps only the teleport share") {
    val m = pr(Seq((1L, 2L, 1L), (2L, 1L, 1L)), Seq(1L, 2L, 7L))
    assert(m(7L) < m(1L))
    // its rank converges to base/(1-0.85·0/…): teleport + its dangling share
    assert(m(7L) > 0L)
  }

  test("pageRank: deterministic under input shuffling and repartitioning") {
    import spark.implicits._
    val edges = (0L until 40L).map(i => (i, (i * 7 + 3) % 40, 1L + i % 3))
    val a = pr(edges, 0L until 40L)
    val shuffled = scala.util.Random.shuffle(edges.toVector)
    val b = Relational.pageRank(
      shuffled.toDF("src", "dst", "w").repartition(7),
      (0L until 40L).reverse.toDF("item").repartition(3), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "integer fixed-point PageRank must be partition-order-free")
  }

  test("personalizedPageRank: trust flows only FROM seeds; mass stays on the reachable set") {
    import spark.implicits._
    // seed 1 → 2 → 3; node 9 links INTO the seed but nothing reaches it
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (9L, 1L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("item")
    val m = Relational.personalizedPageRank(edges, nodes, Seq(1L).toDF("item"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(9L) == 0L, "no in-links from the seed side ⇒ zero trust")
    assert(m(1L) > 0L && m(2L) > 0L && m(3L) > 0L, m.toString)
    // mass conservation over the seed-reachable set (truncation only)
    val total = m.values.sum
    assert(total <= 1000000000000L && total > 1000000000000L - 1000L, total.toString)
    // uniform special case: seeds = all vertices ≡ plain pageRank
    val uni = Relational.personalizedPageRank(edges, nodes, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Relational.pageRank(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uni == plain)
    // a dangling seed keeps all mass: teleport and dangling both return to it
    val m2 = Relational.personalizedPageRank(
      Seq((2L, 3L, 1L)).toDF("src", "dst", "w"),
      Seq(1L, 2L, 3L).toDF("item"), Seq(1L).toDF("item"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m2(1L) > 999999990000L && m2(2L) == 0L && m2(3L) == 0L, m2.toString)
  }

  test("pageRank: empty vertex set fails loudly") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Relational.pageRank(Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w"),
        Seq.empty[Long].toDF("item"))
    }
    assert(e.getMessage.contains("empty"))
  }

  // ---- salsa ----

  private def sl(edges: Seq[(Long, Long, Long)], iters: Int = 5) = {
    import spark.implicits._
    Relational.salsa(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
  }

  test("salsa: symmetric 2-cycle gives equal auth and hub everywhere; mass conserved") {
    val m = sl(Seq((1L, 2L, 1L), (2L, 1L, 1L)))
    assert(m(1L) == m(2L), "symmetric graph must tie")
    val authTotal = m.values.map(_._1).sum
    val hubTotal = m.values.map(_._2).sum
    // probability-normalized walks conserve L1 mass up to grid truncation
    assert(authTotal <= 1000000000000L && authTotal > 1000000000000L - 1000L, s"$authTotal")
    assert(hubTotal <= 1000000000000L && hubTotal > 1000000000000L - 1000L, s"$hubTotal")
  }

  test("salsa: an authority fed by every hub outranks; pure hubs carry zero auth") {
    // 1→3, 2→3, 1→4: node 3 is the stronger authority, 1/2 are pure hubs
    val m = sl(Seq((1L, 3L, 1L), (2L, 3L, 1L), (1L, 4L, 1L)))
    assert(m(3L)._1 > m(4L)._1, m.toString)
    assert(m(1L)._1 == 0L && m(2L)._1 == 0L, "pure hubs have no authority mass")
    assert(m(3L)._2 == 0L && m(4L)._2 == 0L, "pure authorities have no hub mass")
    assert(m(1L)._2 > m(2L)._2, "the hub covering more authorities collects more hub mass")
  }

  test("burstCensus: floor-mean spike flags, quiet types stay silent") {
    import spark.implicits._
    // type A: 10 events in hour 0, 1 in hours 1 and 2 → mean_f = 12/3 = 4,
    // hour 0 bursts at ratio 10e6/4 = 2_500_000; type B flat → no burst
    val ev = (Seq.fill(10)(("A", 100L)) ++ Seq(("A", 3700L), ("A", 7300L)) ++
        Seq(("B", 100L), ("B", 200L), ("B", 3700L), ("B", 3800L)))
      .toDF("event_type", "ts_s")
    val got = Relational.burstCensus(ev, "event_type", "ts_s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("A", 0L, 10L, 2500000L)), got.mkString(","))
  }

  test("botCensus: timer users flag, irregular humans don't, thresholds bind") {
    import spark.implicits._
    // user 1: perfect 60s timer (6 gaps, all 60) → flagged
    // user 2: irregular gaps → modal share below threshold
    // user 3: regular but only 2 gaps → below minGaps
    val ev = ((1 to 7).map(i => (1L, i.toLong, i * 60L)) ++
      Seq((2L, 1L, 0L), (2L, 2L, 10L), (2L, 3L, 25L), (2L, 4L, 100L),
        (2L, 5L, 101L), (2L, 6L, 300L), (2L, 7L, 301L)) ++
      (1 to 3).map(i => (3L, i.toLong, i * 30L)))
      .toDF("user_id", "event_id", "ts_s")
    val got = Relational.botCensus(ev, "user_id", "event_id", "ts_s")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(1L), got.toString)
    assert(got(1L) == ((6L, 1L, 1000000L)), got.toString)
  }

  test("markovAttribution: exact chain value, removal effects ordered by path coverage") {
    import spark.implicits._
    // u1: view→click→purchase; u2: view→purchase; u3: click (dies);
    // u4: view→click (dies). Transition probs (1e-6 grid):
    //   START: view 750000, click 250000; view: click 666666, buy 333333;
    //   click: buy 333333, NULL 666666.
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 4L, "view"), (2L, 5L, "purchase"),
      (3L, 6L, "click"),
      (4L, 7L, "view"), (4L, 8L, "click"))
      .toDF("user_id", "event_id", "event_type")
    val got = Relational.markovAttribution(ev, "user_id", "event_id", "event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // hand-computed exact fixed point (stabilizes after 3 rounds):
    // p(click)=333333000000, p(view)=555554777778, p(START)=499999333333
    assert(got("view")._1 == 499999333333L, got.toString)
    // removing view leaves only START→click→buy = 83333250000
    assert(got("view")._2 == 83333250000L, got.toString)
    // removing click leaves START→view→buy = 249999750000
    assert(got("click")._2 == 249999750000L, got.toString)
    // view carries more conversion mass than click; both strictly positive
    assert(got("view")._3 > got("click")._3 && got("click")._3 > 0L, got.toString)
    // events after the first purchase must not form transitions
    val extra = ev.unionByName(Seq((1L, 9L, "view")).toDF("user_id", "event_id", "event_type"))
    val again = Relational.markovAttribution(extra, "user_id", "event_id", "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again("view") == 499999333333L, "post-conversion events are outside the journey")
  }

  test("coVisitation: session-confined symmetric counts, cap drops bot sessions") {
    import spark.implicits._
    // u1/s1 {1,2,3}, u2/s1 {1,2}, u3/s1 33 items (> cap → dropped)
    val ev = (Seq((1L, 1L, 1L), (1L, 1L, 2L), (1L, 1L, 3L), (1L, 1L, 2L),
        (2L, 1L, 1L), (2L, 1L, 2L)) ++
        (0L until 33L).map(i => (3L, 1L, 100L + i)))
      .toDF("user_id", "sess_id", "item")
    val got = Relational.coVisitation(ev, "user_id", "sess_id", "item",
        k = 5, maxSessionItems = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got((1L, 2L)) == ((2L, 1L)), "pair (1,2) co-visits in both kept sessions")
    assert(got((2L, 1L)) == ((2L, 1L)), "symmetric")
    assert(got((1L, 3L)) == ((1L, 2L)) && got((3L, 1L))._1 == 1L, got.toString)
    assert(!got.keys.exists(_._1 >= 100L), "over-cap session contributes nothing")
    // duplicate items within a session count once per pair
    assert(got((2L, 3L)) == ((1L, 2L)), got.toString)
  }

  test("salsa: deterministic under input shuffling and repartitioning") {
    import spark.implicits._
    val edges = (0L until 40L).map(i => (i, (i * 7 + 3) % 40, 1L + i % 3))
    val a = sl(edges)
    val shuffled = scala.util.Random.shuffle(edges.toVector)
    val b = Relational.salsa(shuffled.toDF("src", "dst", "w").repartition(7), 5)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(a == b, "integer fixed-point SALSA must be partition-order-free")
  }
}
