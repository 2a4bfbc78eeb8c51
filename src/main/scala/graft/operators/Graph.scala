package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics on DataFrames — the Pregel-class tier next to
 * [[Dedup.connectedComponents]]'s min-label propagation. The first member
 * is PageRank over the order graph (which customers/suppliers sit at the
 * center of the trade network — the entity-importance analog of the
 * reference's entity-centric marts, reference README.md:45-47).
 *
 * == Determinism design: integer-scaled arithmetic ==
 *
 * Classic float PageRank sums `0.85 · r(u)/deg(u)` over in-neighbors; the
 * float sum's value depends on addend ORDER, which differs across shuffle
 * partitionings, cluster sizes, and engines — a hash-compare against an
 * independent implementation (the DuckDB oracle, or tomorrow's cluster vs
 * today's laptop) would be flaky in the last ulp. So ranks are kept in
 * exact BIGINT units of 10⁻¹² of the total mass and every step is integer
 * arithmetic:
 *
 *   r₀(v)   = SCALE div N
 *   r'(v)   = (15·SCALE) div (100·N)  +  Σ_{u→v} (85·r(u)) div (100·deg(u))
 *
 * Integer sums are associative — the result is bit-identical under ANY
 * partitioning and in any engine, the same reproducibility contract the
 * SHA-lane hash twins give the sketch operators. Max intermediate is
 * 85·SCALE < 2⁶³, overflow-safe under ANSI mode. The floor in each
 * division leaks ≤1 unit per (node, iteration) of mass — bounded by
 * N·iters·10⁻¹² of total rank, irrelevant at any analytic precision, and
 * identically leaked by both engines.
 */
object Graph {

  val Scale: Long = 1000000000000L

  /**
   * Deterministic integer-scaled PageRank with damping 0.85.
   *
   * `edges` must carry BIGINT `src`/`dst` columns, already in the directed
   * form to be ranked (pass both directions for an undirected graph — out-
   * degree then never being 0 means no dangling-mass term is needed; rank
   * mass stays on the graph). Nodes are exactly the distinct `src` set.
   *
   * Scale shape: degrees are ONE groupBy(src) over the edge table, and the
   * per-iteration step is join(ranks, src) → groupBy(dst) — the standard
   * Pregel message round as two hash exchanges over the EDGE table, never
   * anything wider. The rank vector (|nodes| rows of two BIGINTs) is the
   * only state that survives an iteration. With `iterations` in the
   * PageRank-typical 5–20 range the whole unrolled loop is one Catalyst
   * plan; at 100 TB edge scale, cache + `localCheckpoint` the rank vector
   * every few rounds exactly as [[Dedup.connectedComponents]] does to keep
   * lineage flat — the declared query keeps the pure plan so the oracle
   * and plan audit see the whole shape.
   *
   * Output: `(node BIGINT, deg BIGINT, rank BIGINT)` — rank in units of
   * 10⁻¹² of total mass (divide by 1e12 for the conventional value).
   */
  def pageRank(edges: DataFrame, iterations: Int,
               cacheEdges: Boolean = false): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // N is a handful of bytes of driver state (one count job) — it has to
    // be exact for the integer teleport term, and a scalar literal keeps
    // the per-iteration plan free of an extra cross join.
    val n = deg.count()
    require(n > 0, "pageRank needs a non-empty edge set")
    val teleport = (15L * Scale) / (100L * n)
    // All iterations run inside ONE action, so Catalyst's ReuseExchange
    // computes the (edge ⨝ degree) subtree once per execution already —
    // an eager cache measured strictly slower at bench scale. For deep
    // iteration counts (lineage depth) or when the caller iterates across
    // SEPARATE actions, `cacheEdges` materializes it once and truncates
    // lineage (the classic edge-cache of iterative graph processing).
    // shuffle_hash hints, node-sized build side: sort-merge planned the
    // unrolled loop with per-iteration SORTS of edge-scale data (the
    // q112 finding, same loop shape); the hash build is the per-
    // partition slice of a node-sized vector and integer-sum
    // determinism makes the strategy swap bit-invisible to results
    val joined = e.join(deg.hint("shuffle_hash"), "src")
    val withDeg = if (cacheEdges) joined.localCheckpoint() else joined
    val nodes = deg.select(col("src").as("node"), col("deg"))
    var ranks = nodes.select(col("node"), lit(Scale / n).as("rank"))
    for (_ <- 1 to iterations) {
      val inMass = withDeg
        .join(ranks.hint("shuffle_hash"), withDeg("src") === ranks("node"))
        .select(col("dst"), expr("(85 * rank) div (100 * deg)").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("in_mass"))
      // left join against the node set so a node nothing points at (possible
      // in directed inputs) keeps its teleport share instead of vanishing
      ranks = nodes
        .join(inMass.hint("shuffle_hash"), nodes("node") === inMass("dst"),
          "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("in_mass"), lit(0L))).as("rank"))
    }
    nodes.join(ranks.hint("shuffle_hash"), "node")
  }

  /**
   * Personalized PageRank: rank mass teleports back to the SEED set
   * instead of uniformly — the standard "entities related to these"
   * recommendation primitive. Same integer-scaled determinism contract
   * as [[pageRank]] (BIGINT units of 10⁻¹² mass, floor divisions,
   * associative integer sums ⇒ bit-identical under any partitioning and
   * in any engine — the q112 oracle unrolls the same iterations as
   * plain SQL layers).
   *
   * The rank vector stays SPARSE: mass starts on the seeds and only
   * ever reaches nodes within `iterations` hops, so each round's state
   * is (reached nodes) rows, not |V| — the property that makes seed-
   * local ranking cheap on a 100 TB graph where global PageRank is not.
   * Contributions that floor to 0 are dropped each round (identically
   * in the oracle's HAVING), keeping the support tight.
   *
   * Output: `(node, rank)` for nodes holding mass after `iterations`
   * rounds; rank in units of 10⁻¹² of total seed mass.
   */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val sd = seeds.select(col("node").cast("long").as("node")).distinct()
    val s = sd.count()
    require(s > 0, "personalizedPageRank needs a non-empty seed set")
    val tele = (15L * Scale) / (100L * s)
    // SHUFFLED-HASH joins, node-sized side as build (r12 verdict #3's
    // measured lever — distinct from the recorded broadcast-ranks
    // negative, which removed the exchange; this keeps the Pregel
    // message-passing partitioning and removes the SORTS): sort-merge
    // planned the unrolled loop as 8 SMJs / 12 sorts with each
    // iteration re-sorting edge-scale data, while the hash build is the
    // per-partition slice of a node-sized vector. Integer-sum
    // determinism makes the strategy swap bit-invisible to results.
    //
    // MEASURED NEGATIVES (sf1, do not retry — the broadcast-ranks class):
    //  - `.repartition(src).cache()` on withDeg: 42 s vs ~12 s baseline.
    //    AQE inside the cached plan hides its output partitioning, so
    //    every iteration STILL prepends an edge-sized exchange, now over
    //    a columnar-materialized relation paid on top.
    //  - `.localCheckpoint()` on withDeg: 27 s. Materializing the joined
    //    edge table loses the reusable shuffle stage — AQE's runtime
    //    exchange reuse already computes the (e ⨝ deg) subtree once per
    //    action, so recompute-with-reuse beats materialize-and-rescan.
    val withDeg = e.join(deg.hint("shuffle_hash"), "src")
    var ranks = sd.select(col("node"), lit(Scale / s).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks.hint("shuffle_hash"), withDeg("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("(85 * rank) div (100 * deg)").as("m"))
      val teleRows = sd.select(col("node"), lit(tele).as("m"))
      ranks = contribs.unionByName(teleRows)
        .groupBy(col("node")).agg(sum(col("m")).as("rank"))
        .filter(col("rank") > 0)
    }
    ranks
  }

  /**
   * Bounded-hop BFS shortest distances from a seed set — the recursive-
   * CTE capability Spark SQL lacks (no `WITH RECURSIVE`), expressed as
   * FRONTIER iteration: each round expands only the nodes discovered in
   * the previous round (`frontier ⨝ edges`), anti-joins the already-
   * visited set, and unions the survivors in at distance `i`. First
   * visit is shortest path (all edges weigh 1), distances are exact
   * BIGINTs, and the result is the fixpoint a recursive CTE computes —
   * the q110 oracle IS DuckDB's `WITH RECURSIVE` over the same graph.
   *
   * Scale shape: per-round work is O(frontier-adjacent edges), not
   * O(all edges) — on high-diameter graphs the anti-join keeps late
   * rounds cheap, and on small-diameter graphs the frontier empties and
   * later rounds are no-ops. The visited set (`node, dist`) is the only
   * growing state — and its LOGICAL plan references itself twice per
   * round (the union and the anti-join), so unchecked lineage DOUBLES
   * per hop: the same exponential-plan failure
   * [[Dedup.connectedComponents]] hit at diameter 8 against the 2 GiB
   * plan-string cap. Past `checkpointEvery` rounds the visited set and
   * frontier are localCheckpoint-ed (lineage truncated to a flat scan);
   * shallow calls — every declared query — keep the pure unrolled plan.
   *
   * Output: `(node, dist)` for every node reachable within `maxHops`
   * (seeds at 0); unreachable nodes are absent.
   */
  def bfsDistances(edges: DataFrame, seeds: DataFrame,
                   maxHops: Int, checkpointEvery: Int = 6): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    var dist = seeds.select(col("node").cast("long").as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
    var frontier = dist
    for (i <- 1 to maxHops) {
      // NOTE: q112's shuffle_hash lever was TRIED here and on
      // [[ssspWeighted]] and measured NEGATIVE-or-wash at sf1
      // (q182 7-repeat medians 8.5 s SMJ vs 10.8 s SHJ; q110 flat) —
      // the growing visited/cost tables make poor hash builds, unlike
      // PPR's sparse rank vector. Do not retry; keep sort-merge.
      val next = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(i.toLong).as("dist"))
      frontier = next
      dist = dist.unionByName(next)
      if (i % checkpointEvery == 0 && i < maxHops) {
        dist = dist.localCheckpoint()
        frontier = frontier.localCheckpoint()
      }
    }
    dist
  }

  /**
   * Triangle counting + local clustering coefficients — the
   * community-structure screen next to the file's path-based members
   * (how CLUSTERED is each node's neighborhood, vs [[pageRank]]'s "how
   * central"). Non-iterative, so unlike the Pregel-class members it is
   * one fixed three-join plan.
   *
   * Scale design is the degree-ordered orientation (the classic
   * node-iterator+ bound): each undirected edge is directed from its
   * (degree, id)-smaller endpoint to the larger, which makes the
   * orientation acyclic with out-degree O(√m) regardless of how skewed
   * the raw degree distribution is — the celebrity node never fans out.
   * Wedges are then out-neighbor PAIRS of one node (co-partitioned
   * self-join on the source), and a triangle is a wedge whose far pair
   * closes in the canonical edge set (equi-join on the pair key). Every
   * triangle has exactly ONE node with two out-edges into it under an
   * acyclic orientation, so each is counted once, no /3 or /6 fixups.
   *
   * Everything is integer; the local coefficient `2·t / (deg·(deg−1))`
   * is a single correctly-rounded division of exact Longs — hash-raw
   * deterministic (q163 discipline).
   *
   * Emits one row per node of degree ≥ 2 (degree-1 nodes close no
   * wedge; they carry cc = 0 trivially and are left out):
   * (node, degree, n_tri, local_cc).
   */
  def triangleStats(edges: DataFrame): DataFrame = {
    // materialize the canonical edge set once: degrees, orientation and
    // the closure join all read it (the q110 localCheckpoint class)
    val e = edges.toDF("__s", "__d")
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("degree").as("__da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("degree").as("__db")), Seq("b"))
    // orient low (degree, id) → high; ties cannot happen on id (a ≠ b)
    val oriented = withDeg.select(
      when(col("__da") < col("__db") ||
        (col("__da") === col("__db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"))
    val o1 = oriented.select(col("u"), col("v").as("v1"))
    val o2 = oriented.select(col("u"), col("v").as("v2"))
    // wedge far-pair in canonical (a < b) order matches e's key directly
    val tri = o1.join(o2, Seq("u")).filter(col("v1") < col("v2"))
      .join(e, col("v1") === col("a") && col("v2") === col("b"))
      .select(col("u"), col("v1"), col("v2"))
    val perNode = tri
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_tri"))
    deg.filter(col("degree") >= 2)
      .join(perNode, Seq("n"), "left")
      .select(col("n").as("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        ((lit(2L) * coalesce(col("n_tri"), lit(0L))).cast("double") /
          (col("degree") * (col("degree") - lit(1L))).cast("double"))
          .as("local_cc"))
  }

  /**
   * Bounded k-core peel — the dense-subgraph filter of the tier (which
   * nodes survive when everything of degree < k is repeatedly stripped):
   * the standard spam/periphery screen before community analytics like
   * [[triangleStats]], and the recursive-deletion capability Spark SQL
   * cannot state (no `WITH RECURSIVE`), expressed as synchronous
   * rounds exactly like [[bfsDistances]]'s frontier loop.
   *
   * Each round recomputes degrees over the SURVIVING undirected edge
   * set, drops every node below `k`, and restricts edges to surviving
   * endpoints (two LEFT SEMI probes — the edge table is never widened).
   * Semantics are bounded-round by contract: after `rounds` full peels
   * the result is the surviving subgraph's degree table, whether or not
   * the peel has reached its fixpoint — the same explicit-bound
   * determinism [[bfsDistances]] gives `maxHops`, and what lets the
   * q181 oracle be the identical rounds unrolled as plain SQL layers.
   * (Run with `rounds` ≥ graph diameter to guarantee the true k-core.)
   *
   * Scale shape — FRONTIER-INCREMENTAL (round 12; the previous peel
   * recomputed every vertex's degree from the full surviving edge set
   * each round, the steepest sf1 member at 7.52× wall for 10× data).
   * Degrees are computed from the edge set ONCE (the unavoidable O(E)
   * groupBy), then maintained by difference: each round's kill set is a
   * filter of the NODE-sized degree table, and only the neighbors of
   * just-killed vertices have their degrees patched (one frontier-sized
   * groupBy). The edge set still shrinks by two anti-joins, but the
   * kill set rides a measured-cardinality broadcast (the
   * targetEncodeLoo guard pattern: ≤ `maxBroadcastKill` rows → explicit
   * broadcast, else shuffle fallback), so the O(E) side never
   * exchanges — per-round cost is two broadcast-filtered SCANS of the
   * shrinking edge set plus node-sized bookkeeping, vs the old
   * 2E-row degree shuffle + two shuffle semi-joins. When a round kills
   * nothing the peel has reached its fixpoint and remaining rounds are
   * identical no-ops, so the loop exits early — same bounded-round
   * result, bit for bit. Surviving edges and the degree table are
   * localCheckpoint-ed every round (each is consumed twice by the next
   * round — the q110/q166 class; uncheckpointed the work multiplies
   * ~4× per round, measured 51 s → 1.4 s at sf0.1).
   *
   * Output: `(node, degree)` over the subgraph remaining after
   * `rounds` peels (nodes that lost every edge are absent).
   */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
            maxBroadcastKill: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = edges.toDF("__s", "__d")
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    // round 0: the only full-edge-set degree computation
    var deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree")).localCheckpoint()
    var r = 0
    var fixpoint = false
    while (r < rounds && !fixpoint) {
      r += 1
      val kill = deg.filter(col("degree") < k).select(col("n"))
        .localCheckpoint()
      val nKill = kill.count()
      if (nKill == 0) {
        // no vertex below k ⇒ every remaining round is a no-op; the
        // bounded-round contract is preserved exactly
        fixpoint = true
      } else {
        // kill is frontier-sized (≤ killed-so-far ≤ |V|); 8 B/row of
        // Long at the 1M default is the ~10 MB broadcast budget class —
        // above it the joins fall back to shuffles and stay correct
        val ks = if (nKill <= maxBroadcastKill) broadcast(kill) else kill
        // one scan: edges with exactly one killed endpoint debit the
        // SURVIVING endpoint; both-killed edges debit nobody
        val delta = e
          .join(ks.select(col("n").as("a"), lit(1).as("__ka")), Seq("a"), "left")
          .join(ks.select(col("n").as("b"), lit(1).as("__kb")), Seq("b"), "left")
          .filter(col("__ka").isNotNull =!= col("__kb").isNotNull)
          .select(when(col("__ka").isNotNull, col("b")).otherwise(col("a"))
            .as("n"))
          .groupBy(col("n")).agg(count(lit(1)).as("__lost"))
        e = e.join(ks.select(col("n").as("a")), Seq("a"), "left_anti")
          .join(ks.select(col("n").as("b")), Seq("b"), "left_anti")
          .localCheckpoint()
        deg = deg.join(ks, Seq("n"), "left_anti")
          .join(delta, Seq("n"), "left")
          .select(col("n"),
            (col("degree") - coalesce(col("__lost"), lit(0L))).as("degree"))
          .localCheckpoint()
      }
    }
    // a survivor whose neighbors all died carries degree 0 here; the
    // full-recompute peel derives degrees from the edge set, where such
    // a node is simply absent — filter for the identical contract
    deg.filter(col("degree") > 0).select(col("n").as("node"), col("degree"))
  }

  /** The pre-round-12 full-recompute peel, kept as the oracle twin for
    * the GraphSpec equivalence property (incremental [[kCore]] ==
    * recompute-from-scratch, any graph / k / rounds). Not a declared
    * query; [[kCore]] is the production path. */
  private[graft] def kCoreRecompute(edges: DataFrame, k: Int,
                                    rounds: Int): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("degree"))
    var e = edges.toDF("__s", "__d")
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("degree") >= k).select(col("n"))
      e = e.join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
        .localCheckpoint()
    }
    degrees(e).select(col("n").as("node"), col("degree"))
  }

  /**
   * Bounded-hop single-source shortest paths over NON-NEGATIVE integer
   * edge weights — [[bfsDistances]]'s weighted sibling, as synchronous
   * Bellman-Ford relaxation rounds: each round offers every neighbor of
   * a reached node `cost + w` and keeps the per-node MIN. After `h`
   * rounds the cost table holds the exact minimum over all paths of at
   * most `h` edges — with non-negative weights that equals the minimum
   * over all WALKS of ≤ h hops, which is precisely what the q182
   * oracle's bounded recursive CTE enumerates, so the two engines agree
   * by construction, not by convergence luck. All-integer costs: exact
   * BIGINTs, no float accumulation anywhere.
   *
   * Scale shape — FRONTIER-DELTA messaging (the q181 k-core treatment
   * applied to relaxation, VERDICT r14 #3): each round relaxes only the
   * edges out of nodes whose best cost IMPROVED in the previous round,
   * never the whole reached set. That is exact, not approximate: an
   * unimproved node's offers are byte-identical to the offers it
   * already made the round after it last improved, and the per-node
   * running MIN has absorbed them — re-sending changes nothing (the
   * non-negative-weights argument above is untouched, so the ≤ h-hop
   * walk-minimum equality with the oracle's recursive CTE holds
   * verbatim; GraphSpec's driver Bellman-Ford oracle pins it). The
   * improvement test rides the SAME union+groupBy the merge already
   * pays — dist rows carry their cost in an `old` lane, so one
   * aggregate yields both the new minimum and the previous one, and
   * the frontier is a filter over the aggregate output: zero extra
   * shuffles versus the full-relaxation loop, with the message join's
   * probe side shrunk from |reached| to |changed|. The win is graph-
   * shape-dependent: on high-diameter graphs the frontier collapses
   * after the first rounds; on q182's dense 4-hop bipartite trade
   * graph |changed| ≈ |reached| every round, and the MEASURED r15
   * numbers (sf1 solo protocol, adjacent warm runs, calib clean) are a
   * wash on that fixture — old 7.70 s, delta+eager 6.74/7.63 s,
   * old+eager 7.51 s. What is NOT a wash: delta WITHOUT the eager
   * round-state materialization read 11.93 s (the merge output feeds
   * two next-round branches, and an unmaterialized round recomputes
   * its predecessor per branch) — if you lower `checkpointEvery`
   * expecting pure-plan reuse, measure first. The residual q182 cost
   * is the 4 edge-scale message shuffles themselves, irreducible under
   * the exact ≤ h-hop oracle contract (pre-partitioning the edge table
   * across rounds is the r13 PPR recorded negative — AQE hides cached
   * output partitioning and the exchange returns; do not retry).
   *
   * State between rounds is (reached node, best cost) plus the changed
   * frontier; both derive from the round's merge output, which is
   * localCheckpoint-ed once per `checkpointEvery` rounds serving both
   * branches (the declared q182 runs `checkpointEvery = 1` — measured
   * at sf1 as above).
   *
   * Output: `(node, cost)` for every node reachable within `maxHops`
   * (seeds at 0); unreachable nodes are absent.
   */
  def ssspWeighted(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                   checkpointEvery: Int = 4): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
    var dist = seeds.select(col("node").cast("long").as("node")).distinct()
      .select(col("node"), lit(0L).as("cost"))
    var frontier = dist
    for (i <- 1 to maxHops) {
      // sort-merge on purpose — see the bfsDistances loop note: the
      // q112 shuffle_hash lever measured NEGATIVE here (7-repeat sf1
      // medians 8.5 s SMJ vs 10.8 s SHJ); the cost table grows to
      // |reached| and makes a poor hash build. Do not retry.
      val offers = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"),
          lit(null).cast("long").as("old"))
      var merged = dist
        .select(col("node"), col("cost"), col("cost").as("old"))
        .unionByName(offers)
        .groupBy(col("node"))
        .agg(min(col("cost")).as("cost"), min(col("old")).as("old"))
      // the round state feeds BOTH next-round branches (dist via the
      // union, frontier via the message join); materializing it once
      // per cadence point serves the pair and keeps lineage flat
      if (i % checkpointEvery == 0 && i < maxHops)
        merged = merged.localCheckpoint()
      dist = merged.select(col("node"), col("cost"))
      frontier = merged
        .filter(col("old").isNull || col("cost") < col("old"))
        .select(col("node"), col("cost"))
    }
    dist
  }

  /**
   * Degree assortativity — the one-number mixing summary of the tier:
   * Pearson correlation between the degrees at the two ends of an edge
   * (positive: hubs attach to hubs — social; negative: hubs attach to
   * leaves — technological/bipartite projections). Read next to
   * [[triangleStats]]'s clustering to characterize a graph before
   * trusting community or centrality results on it.
   *
   * Exactness (q163 discipline): over the canonical undirected edge set
   * each edge contributes BOTH orientations, making the x- and y-
   * marginals identical, so
   *
   *   r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) ,  n = 2·|E|
   *
   * with every Σ an associative EXACT-INTEGER sum of degree products —
   * order-independent in any engine — and r ONE correctly-rounded
   * division of two exactly-representable operands. The moment sums are
   * CROSS-MULTIPLIED (n·Σxy, (Σx)²) they leave Long range on real
   * graphs — measured at the sf1 bench tile (12M endpoint rows):
   * n·Σxy ≈ 10¹⁹ > 2⁶³, which ANSI mode correctly refused — so the
   * sums and every product of them ride DECIMAL(38,0) (Spark's exact
   * 128-bit lane; the DuckDB oracle mirrors with HUGEINT), good to
   * 10³⁸: a graph would need ~10¹⁹ edges to exhaust it, which is not a
   * graph this century. Output is one row: `(n_edges, n_nodes, r)`;
   * r is NULL on a degree-regular graph (zero variance — the statistic
   * is undefined).
   */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val e = edges.toDF("__s", "__d")
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val dec = "decimal(38,0)"
    // r16 shape: the x-marginal over both orientations is the DEGREE
    // SEQUENCE weighted by itself — each vertex v is a directed-edge
    // source exactly deg(v) times — so n = Σdeg, Σx = Σdeg², Σx² = Σdeg³
    // come from ONE node-sized aggregate and the edge table is joined
    // only for the one moment that genuinely needs per-edge products:
    // Σxy = 2·Σ_e deg(a)·deg(b). Identical exact-integer values in
    // DECIMAL(38,0) (the old both-orientations union computed the same
    // sums row-doubled), so r's operands — and r — are bit-identical.
    val moments = deg.agg(
      coalesce(sum(col("deg").cast(dec)), lit(0).cast(dec)).as("__n"),
      sum(col("deg").cast(dec) * col("deg").cast(dec)).as("__sx"),
      sum(col("deg").cast(dec) * col("deg").cast(dec) * col("deg").cast(dec))
        .as("__sxx"),
      count(lit(1)).as("n_nodes"))
    val sxy = e
      .join(deg.select(col("n").as("a"), col("deg").as("__da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("__db")), Seq("b"))
      .agg(coalesce(
        sum(col("__da").cast(dec) * col("__db").cast(dec)) * lit(2).cast(dec),
        lit(0).cast(dec)).as("__sxy"))
    moments.crossJoin(broadcast(sxy))
      .select((col("__n") / lit(2L)).cast("long").as("n_edges"),
        col("n_nodes"),
        (col("__n") * col("__sxy") - col("__sx") * col("__sx")).as("__num"),
        (col("__n") * col("__sxx") - col("__sx") * col("__sx")).as("__den"))
      .select(col("n_edges"), col("n_nodes"),
        when(col("__den") =!= 0L,
          col("__num").cast("double") / col("__den").cast("double"))
          .as("r"))
  }
}
