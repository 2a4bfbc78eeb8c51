package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-scaled PageRank: hand-computed rounds, fixed points, totality. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = Graph.Scale

  test("pageRank: one round on a 3-node path matches hand integer arithmetic") {
    // 1 -> 2 -> 3 -> 1 (a directed cycle), plus 1 -> 3.
    // deg: 1 -> 2, 2 -> 1, 3 -> 1.  N = 3.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r0 = S / 3
    val tele = (15L * S) / (100L * 3)
    val out = Graph.pageRank(edges, 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // r1(1) = tele + (85*r0) div 100         (from 3, deg 1)
    // r1(2) = tele + (85*r0) div 200         (from 1, deg 2)
    // r1(3) = tele + (85*r0) div 200 + (85*r0) div 100
    assert(out(1L) === ((2L, tele + (85 * r0) / 100)))
    assert(out(2L) === ((1L, tele + (85 * r0) / 200)))
    assert(out(3L) === ((1L, tele + (85 * r0) / 200 + (85 * r0) / 100)))
  }

  test("pageRank: uniform is the fixed point of a regular graph, mass conserved") {
    // Undirected 4-cycle: every node has degree 2 -> rank stays SCALE/4
    // (up to the deterministic integer-floor leak, identical per node).
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.pageRank(edges, 7).collect()
    assert(out.length === 4)
    val ranks = out.map(_.getLong(2)).distinct
    assert(ranks.length === 1, s"regular graph must stay uniform: ${out.toSeq}")
    assert(math.abs(ranks.head - S / 4) <= 7,
      "leak is at most 1 unit per iteration per node")
  }

  test("pageRank: a source node with no in-edges keeps exactly the teleport share") {
    // 1 -> 2, 2 -> 1 ... and 3 -> 1 with nothing pointing at 3.
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val tele = (15L * S) / (100L * 3)
    val out = Graph.pageRank(edges, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(3L) === tele)
    // the 1<->2 cycle oscillates with decaying amplitude (damping 0.85) —
    // at the fixed point node 1 (two in-edges) dominates; iterate enough
    // for the oscillation term (0.85^k) to fall below the gap
    val deep = Graph.pageRank(edges, 18).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(deep(1L) > deep(2L), "node 1 has two in-edges, node 2 one")
    assert(out.values.sum <= S, "rank mass never exceeds the total")
  }

  test("pageRank: cacheEdges changes the execution, never the answer") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val plain = Graph.pageRank(edges, 5).orderBy("node").collect().toSeq
    val cached = Graph.pageRank(edges, 5, cacheEdges = true)
      .orderBy("node").collect().toSeq
    assert(plain === cached)
  }

  test("pageRank: result is identical under different partitionings") {
    val edges = (1L to 40L).flatMap { i =>
      Seq((i, i % 40 + 1), (i % 40 + 1, i), (i, (i * 7) % 40 + 1), ((i * 7) % 40 + 1, i))
    }.toDF("src", "dst")
    val a = Graph.pageRank(edges.repartition(1), 5)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(edges.repartition(17, col("dst")), 5)
      .orderBy("node").collect().toSeq
    assert(a === b)
  }

  private def bfsMap(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     hops: Int): Map[Long, Long] =
    Graph.bfsDistances(edges.toDF("src", "dst"), seeds.toDF("node"), hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bfs: known distances on a path with a shortcut, cycles safe") {
    // 1→2→3→4→5 plus shortcut 1→4; cycle back-edge 5→1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (5L, 1L))
    val d = bfsMap(edges, Seq(1L), hops = 4)
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
    // hop bound respected: from node 3 only two hops reach 5
    assert(bfsMap(edges, Seq(3L), hops = 1) === Map(3L -> 0L, 4L -> 1L))
  }

  test("bfs: multi-seed minimum and unreachable-node absence") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val d = bfsMap(edges, Seq(1L, 10L), hops = 3)
    // 20/21 live in a component no seed touches
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 10L -> 0L, 11L -> 1L))
    // a seed that is also reachable from another seed stays at 0
    val d2 = bfsMap(Seq((1L, 2L), (2L, 1L)), Seq(1L, 2L), hops = 2)
    assert(d2 === Map(1L -> 0L, 2L -> 0L))
  }

  test("ppr: support stays within k hops of the seeds; mass bounded by seed mass") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (10L, 11L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.personalizedPageRank(edges, Seq(1L).toDF("node"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // support ⊆ {seed} ∪ nodes within 3 hops — node 5 is 4 hops out, and
    // the 10-11 component is unreachable
    assert(out.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
    assert(out.contains(1L) && out.contains(2L))
    // floors only LOSE mass: total rank never exceeds the seed mass
    assert(out.values.sum <= Graph.Scale)
    // the seed retains its teleport share at minimum
    assert(out(1L) >= (15L * Graph.Scale) / 100L)
  }

  test("ppr: deterministic under partitioning; multi-seed mass splits evenly at init") {
    val edges = (1L to 30L).flatMap(i =>
      Seq((i, i % 30 + 1), (i % 30 + 1, i))).toDF("src", "dst")
    val seeds = Seq(1L, 15L).toDF("node")
    val a = Graph.personalizedPageRank(edges.repartition(1), seeds, 4)
      .orderBy("node").collect().toSeq
    val b = Graph.personalizedPageRank(edges.repartition(13, col("dst")), seeds, 4)
      .orderBy("node").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("bfs: equals the naive min-over-walks fixpoint (frontier pruning is lossless)") {
    val rnd = new scala.util.Random(3)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val seeds = Seq(0L, 7L)
    val hops = 4
    // reference: Floyd-ish BFS on the driver
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var ref = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    for (i <- 1 to hops) {
      val nxt = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(ref.contains)
      ref = ref ++ nxt.map(_ -> i.toLong)
      frontier = nxt
    }
    assert(bfsMap(edges, seeds, hops) === ref)
  }

  test("bfs: deep path survives past the lineage-doubling horizon") {
    // a 20-edge path needs 20 rounds; the visited set references itself
    // twice per round, so the pure unrolled plan doubles per hop — the
    // periodic localCheckpoint (default every 6) must keep this cheap
    // and exact (without it this shape is the 2 GiB plan-string failure
    // connectedComponents hit at diameter 8)
    val path = (0L until 20L).map(i => (i, i + 1))
    val out = bfsMap(path, Seq(0L), 20)
    assert(out === (0L to 20L).map(i => i -> i).toMap)
  }

  test("triangleStats: hand-checked K3 + pendant; K4; triangle-free square") {
    def stats(edges: Seq[(Long, Long)]) =
      Graph.triangleStats(edges.toDF("s", "d")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
    // K3 on {1,2,3} plus pendant 4-1
    val k3 = stats(Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 1L)))
    assert(k3.keySet === Set(1L, 2L, 3L), "degree-1 nodes are left out")
    assert(k3(1L) === ((3L, 1L, 2.0 * 1 / (3.0 * 2))))
    assert(k3(2L) === ((2L, 1L, 1.0)))
    assert(k3(3L) === ((2L, 1L, 1.0)))
    // K4: every node in 3 triangles, cc 1
    val k4 = stats(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
    assert(k4.values.toSet === Set((3L, 3L, 1.0)))
    // C4 (square): wedges but no closures
    val c4 = stats(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(c4.values.forall(v => v._2 === 0L && v._3 === 0.0))
  }

  test("triangleStats: reversed duplicates and self-loops are ignored") {
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 1L), (3L, 3L)).toDF("s", "d")
    val got = Graph.triangleStats(noisy).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleStats: matches a brute-force reference on a random graph") {
    val rnd = new scala.util.Random(13)
    val n = 40
    val edges = (for {
      i <- 0 until n; j <- i + 1 until n if rnd.nextDouble() < 0.2
    } yield (i.toLong, j.toLong)).toSeq
    val adj = edges.toSet
    def conn(x: Long, y: Long) = adj.contains((math.min(x, y), math.max(x, y)))
    val want = (for {
      i <- 0L until n; j <- i + 1 until n; k <- j + 1 until n
      if conn(i, j) && conn(j, k) && conn(i, k)
    } yield Seq(i, j, k)).flatten.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val got = Graph.triangleStats(edges.toDF("s", "d")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every deg>=2 node's count matches; nodes missing from `want` have 0
    got.foreach { case (node, t) =>
      assert(t === want.getOrElse(node, 0L), s"node $node") }
    assert(want.keys.forall(got.contains), "no triangle participant dropped")
  }

  private def coreMap(edges: Seq[(Long, Long)], k: Int,
                      rounds: Int): Map[Long, Long] =
    Graph.kCore(edges.toDF("s", "d"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: K4 with pendant chain — cascade strips the chain, keeps K4") {
    // K4 on {1,2,3,4}; chain 4-5-6. k=2: 6 goes round 1, 5 (now deg 1)
    // goes round 2 — the recursive cascade a single degree filter misses.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    assert(coreMap(edges, k = 2, rounds = 1) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L),
      "one round strips only node 6; node 5 still holds its stale edge")
    assert(coreMap(edges, k = 2, rounds = 3) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      "fixpoint: the 2-core is exactly K4")
    // k above the max degree empties the graph
    assert(coreMap(edges, k = 5, rounds = 2) === Map.empty)
  }

  test("kCore: duplicate/reversed/self-loop edges are canonicalized first") {
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L))
    assert(coreMap(noisy, k = 2, rounds = 2) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: incremental frontier peel == full-recompute peel (random graphs)") {
    // the round-12 rewrite maintains degrees by difference and exits at
    // fixpoint; this property pins it bit-identical to the original
    // recompute-from-scratch peel across graphs, k, and round bounds —
    // including mid-cascade rounds where the contract is NOT the fixpoint
    val rng = new scala.util.Random(181)
    for (trial <- 1 to 4) {
      val n = 12 + trial * 4
      val edges = Seq.fill(n * 3)((rng.nextLong(n) + 1, rng.nextLong(n) + 1))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      for (k <- Seq(2, 3); rounds <- Seq(1, 2, 5)) {
        val inc = Graph.kCore(edges.toDF("s", "d"), k, rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val full = Graph.kCoreRecompute(edges.toDF("s", "d"), k, rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(inc === full, s"trial=$trial k=$k rounds=$rounds")
      }
    }
    // and with the broadcast guard forced into its shuffle fallback
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val bc = Graph.kCore(edges.toDF("s", "d"), 2, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sh = Graph.kCore(edges.toDF("s", "d"), 2, 3, maxBroadcastKill = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bc === sh, "shuffle fallback must match the broadcast path")
  }

  test("kCore: deep cascade respects the bounded-round contract") {
    // path 1-2-...-8 hanging off K3 {10,11,12} at 1: with k=2 each round
    // peels exactly one path node from the far end
    val path = (1L to 7L).map(i => (i, i + 1))
    val edges = path ++ Seq((10L, 11L), (11L, 12L), (10L, 12L), (1L, 10L))
    val r2 = coreMap(edges, k = 2, rounds = 2)
    assert(r2.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L, 12L),
      "two rounds peel nodes 8 then 7 — no further")
    val r10 = coreMap(edges, k = 2, rounds = 10)
    assert(r10.keySet === Set(10L, 11L, 12L),
      s"fixpoint 2-core is the K3 (node 1's path support peels away): $r10")
  }

  private def ssspMap(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                      hops: Int): Map[Long, Long] =
    Graph.ssspWeighted(edges.toDF("src", "dst", "w"), seeds.toDF("node"), hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("sssp: cheap long path beats expensive direct edge; hop bound bites") {
    // 1→4 direct costs 10; 1→2→3→4 costs 3
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(ssspMap(edges, Seq(1L), hops = 3) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // with only 1 hop the direct edge is the best ≤1-edge path
    assert(ssspMap(edges, Seq(1L), hops = 1) ===
      Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
  }

  test("sssp: multi-seed min, zero-weight edges, cycles safe") {
    val edges = Seq((1L, 2L, 0L), (2L, 1L, 0L), (2L, 3L, 5L), (9L, 3L, 1L))
    val d = ssspMap(edges, Seq(1L, 9L), hops = 4)
    assert(d === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 9L -> 0L),
      "node 3 takes the cheaper seed (9) and the 0-cycle never loops costs")
  }

  test("sssp: matches driver Bellman-Ford on a random weighted graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)(
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, rnd.nextInt(9).toLong + 1))
    val seeds = Seq(0L, 5L)
    val hops = 5
    var ref = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to hops) {
      val relaxed = edges.flatMap { case (s, d, w) =>
        ref.get(s).map(c => d -> (c + w)) }
      ref = (ref.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, cs) => n -> cs.map(_._2).min }
    }
    assert(ssspMap(edges, seeds, hops) === ref)
  }

  test("degreeAssortativity: star is maximally disassortative (r = -1)") {
    // star K1,4: every edge joins deg-4 to deg-1 → r = −1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val row = Graph.degreeAssortativity(star.toDF("s", "d")).collect().head
    assert(row.getLong(0) === 4L && row.getLong(1) === 5L)
    assert(row.getDouble(2) === -1.0)
  }

  test("degreeAssortativity: regular graph has zero variance → NULL r") {
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val row = Graph.degreeAssortativity(c4.toDF("s", "d")).collect().head
    assert(row.getLong(0) === 4L && row.isNullAt(2),
      "every degree equal: the statistic is undefined, not 0/0")
  }

  test("degreeAssortativity: matches the exact-moment formula on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = (for {
      i <- 0 until 30; j <- i + 1 until 30 if rnd.nextDouble() < 0.15
    } yield (i.toLong, j.toLong)).toSeq
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, v) => n -> v.size.toLong }
    val xy = edges.flatMap(e => Seq((deg(e._1), deg(e._2)),
      (deg(e._2), deg(e._1))))
    val n = xy.size.toLong
    val sx = xy.map(_._1).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val want = (n * sxy - sx * sx).toDouble / (n * sxx - sx * sx).toDouble
    val row = Graph.degreeAssortativity(edges.toDF("s", "d")).collect().head
    assert(row.getLong(0) === edges.size.toLong)
    assert(row.getDouble(2) === want, "bit-identical: same exact integer moments")
  }
}
