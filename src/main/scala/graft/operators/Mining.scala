package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Market-basket mining: frequent item PAIRS and the association rules
 * over them (support / confidence / lift) — the classic co-occurrence
 * operator (Agrawal & Srikant 1994's Apriori, restricted to 2-itemsets,
 * which is the overwhelmingly common production ask: "what co-occurs
 * with what", for related-products, co-failure analysis, or co-topic
 * structure over document tags).
 *
 * Plan shape, in Apriori order:
 *  1. distinct (basket, item) — one shuffle; duplicates inside a basket
 *     carry no co-occurrence information;
 *  2. frequent-1 prune: item supports in one grouped pass; only items
 *     meeting the threshold may appear in a frequent pair (the Apriori
 *     monotonicity), applied as a broadcast semi-join BEFORE any pair is
 *     generated — this is the step that keeps the pair space bounded at
 *     corpus scale;
 *  3. pair generation: the pruned (basket, item) table self-joined on
 *     the basket key with `itemA < itemB` — co-partitioned on the
 *     basket, so pairs materialize only within a partition; per-basket
 *     fan-out is quadratic in the basket's DISTINCT FREQUENT items,
 *     which the frequent-1 prune bounds by the (dimension-sized) item
 *     vocabulary, not by basket size;
 *  4. pair counts ≥ threshold, then each direction emitted as a rule.
 *
 * The support threshold is a RATE (fraction of baskets), so the same
 * query is meaningful at any scale factor; the absolute threshold is
 * `ceil(rate · n_baskets)` — one correctly-rounded double product and
 * ceil, identical in any engine. Rule metrics are single divisions of
 * exact integer counts (support, confidence) and of exact integer
 * products (lift = n·n_ab / (n_a·n_b), products double-exact below
 * 2^53): bit-identical cross-engine with no rounding lane.
 *
 * Emits one row per DIRECTED rule (both directions of each frequent
 * pair): (antecedent, consequent, n_baskets, n_ante, n_cons, n_both,
 * support, confidence, lift).
 */
object Mining {

  def associationRules(baskets: DataFrame, basketCol: Column, itemCol: Column,
                       minSupportRate: Double): DataFrame = {
    require(minSupportRate > 0.0 && minSupportRate <= 1.0,
      s"support rate in (0, 1], got $minSupportRate")
    // materialize the distinct (basket, item) table once: the threshold
    // count, the frequent-1 aggregate and BOTH pair-join legs read it —
    // uncheckpointed each consumer re-runs the distinct's shuffle
    // (measured at sf0.1: 4.8 s → ~2 s; the q110 localCheckpoint class)
    val bi = baskets.select(basketCol.as("__b"), itemCol.as("__i"))
      .distinct().localCheckpoint()
    // one scalar action: the basket universe size (drives the threshold)
    val nBaskets = bi.select(col("__b")).distinct().count()
    val minSup = math.ceil(minSupportRate * nBaskets).toLong
    val counts1 = bi.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val freq1 = counts1.filter(col("__ni") >= minSup)
    // Apriori prune before pair generation (broadcast: the frequent-item
    // table is vocabulary-sized by construction)
    val pruned = bi.join(broadcast(freq1.select(col("__i"))), Seq("__i"),
      "left_semi")
    // r16 pair generation: one groupBy(basket) into a SORTED distinct-item
    // array, pairs emitted scan-side by an index comprehension over it —
    // the basket-co-partitioned self-join spelled without the join: the
    // old shape shuffled the pruned table into the join and SORTED both
    // legs; this shape shuffles it once into a hash aggregate and never
    // sorts row-scale data (sort_array orders each basket's ≤vocabulary
    // items in-place). Same pair set bit-for-bit: items are distinct per
    // basket (bi is distinct) and i < j over the ascending array is
    // exactly `__ia < __ib`. Fan-out is unchanged — quadratic in the
    // basket's distinct FREQUENT items, bounded by the frequent-1 prune.
    val pairs = pruned
      .groupBy(col("__b"))
      .agg(sort_array(collect_list(col("__i"))).as("__items"))
      .select(explode(expr(
        """flatten(transform(__items, (x, i) ->
          |  transform(slice(__items, i + 2, size(__items)),
          |            y -> named_struct('__ia', x, '__ib', y))))""".stripMargin))
        .as("__p"))
      .select(col("__p.__ia").as("__ia"), col("__p.__ib").as("__ib"))
      .groupBy(col("__ia"), col("__ib")).agg(count(lit(1)).as("__nab"))
      .filter(col("__nab") >= minSup)
    val withCounts = pairs
      .join(broadcast(freq1.select(col("__i").as("__ia"),
        col("__ni").as("__na"))), Seq("__ia"))
      .join(broadcast(freq1.select(col("__i").as("__ib"),
        col("__ni").as("__nb"))), Seq("__ib"))
    def rules(ante: Column, cons: Column, nA: Column, nC: Column) =
      withCounts.select(
        ante.as("antecedent"), cons.as("consequent"),
        lit(nBaskets).as("n_baskets"),
        nA.as("n_ante"), nC.as("n_cons"), col("__nab").as("n_both"),
        (col("__nab").cast("double") / lit(nBaskets.toDouble)).as("support"),
        (col("__nab").cast("double") / nA.cast("double")).as("confidence"),
        (lit(nBaskets.toDouble) * col("__nab").cast("double") /
          (nA.cast("double") * nC.cast("double"))).as("lift"))
    rules(col("__ia"), col("__ib"), col("__na"), col("__nb"))
      .unionAll(rules(col("__ib"), col("__ia"), col("__nb"), col("__na")))
  }

  /**
   * Sequential (order-aware) rules over per-key event streams —
   * [[associationRules]]'s temporal sibling: where Apriori asks "what
   * co-occurs in a basket", this asks "what IMMEDIATELY FOLLOWS what"
   * (the next-action mining behind navigation analysis, failure-cascade
   * screens, and Markov-model feature tables). A rule `A → B` here means
   * B was the very next event after A in the same key's timeline.
   *
   * Plan shape: ONE key-partitioned ordered window (`lead`) turns each
   * event into its (symbol, next-symbol) adjacent pair — no self-join,
   * no fan-out; the per-key state is a single lookahead row. Antecedent
   * totals (rows that HAVE a successor — the correct denominator: the
   * last event per key predicts nothing) are the row-sums of the
   * UNFILTERED pair-count table, so they cost one grouped pass over a
   * vocabulary²-sized frame and the event-scale window runs exactly
   * once (deriving them from the adjacency table directly would execute
   * the window a second time — PlanSpec pins the single pass). Ordering
   * must be total for the lag chain to be deterministic, so ties on
   * `order` break on `tie` — the q108/q178 contract.
   *
   * Exactness: counts are integers; confidence is ONE correctly-rounded
   * division of exact Longs — hash-raw deterministic (q163 discipline).
   *
   * Emits one row per observed adjacent pair with `n_pair >= minPairs`:
   * (antecedent, consequent, n_pair, n_ante, confidence).
   */
  def sequentialRules(events: DataFrame, key: Column, order: Column,
                      tie: Column, symbol: Column,
                      minPairs: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__k")).orderBy(col("__o"), col("__t"))
    val adj = events
      .select(key.as("__k"), order.as("__o"), tie.as("__t"),
        symbol.as("antecedent"))
      .withColumn("consequent", lead(col("antecedent"), 1).over(w))
      .filter(col("consequent").isNotNull)
    // materialized: vocabulary²-sized, and BOTH the rule filter and the
    // antecedent roll-up read it — uncheckpointed each consumer re-runs
    // the event-scale window (the q166 localCheckpoint class)
    val pairCounts = adj.groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_pair")).localCheckpoint()
    val nAnte = pairCounts.groupBy(col("antecedent"))
      .agg(sum(col("n_pair")).as("n_ante"))
    pairCounts
      .filter(col("n_pair") >= minPairs)
      .join(broadcast(nAnte), Seq("antecedent"))
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        col("n_ante"),
        (col("n_pair").cast("double") / col("n_ante").cast("double"))
          .as("confidence"))
  }
}
