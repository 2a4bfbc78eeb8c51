package graft.operators

import graft.functions.ShaLanes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for training-data pipelines (the selection /
 * retention tier between dedup and packing): deterministic sampling,
 * keep-latest version resolution, and per-group quotas. All are
 * scan-side or single-partitioned-window plans — no global ordering, no
 * driver loops — and every one is exactly reproducible in ANSI SQL for
 * the DuckDB oracle.
 */
object Curate {

  /**
   * Deterministic stratified sampling: keep a row iff the SHA-256 lane of
   * its key ([[ShaLanes]] — uniform in [0, 2^60)) falls under
   * `rate × 2^60`, where `rate` may vary per row (e.g. per language /
   * source stratum). A pure scan-side filter: reproducible across runs,
   * engines and cluster sizes, with no RNG state and no shuffle —
   * the property that matters when re-materializing a 100 TB corpus cut.
   * Prefix the key (`"sample|" + id`) to decorrelate from other lane uses.
   */
  def hashSample(df: DataFrame, keyCol: Column, rate: Column): DataFrame =
    df.filter(ShaLanes.lane(keyCol.cast("string")).cast("double") <
      rate * lit(ShaLanes.LaneSpace))

  /**
   * Deterministic train/val/test assignment: each row lands in the first
   * split whose cumulative weight bound exceeds the row's SHA-lane
   * position in [0, 2^60) — the hash-bucket analog of [[hashSample]], so
   * the same properties hold: pure scan-side projection (no RNG state, no
   * shuffle, no global count), stable across runs, engines, cluster sizes
   * and corpus growth (a doc keeps its split when new docs arrive — the
   * property that keeps eval sets frozen across corpus versions).
   * `splits` are (name, weight) with weights summing to 1. Prefix the key
   * (`"split|" + id`) to decorrelate from other lane uses.
   */
  def hashSplit(df: DataFrame, keyCol: Column,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val lane = ShaLanes.lane(keyCol.cast("string")).cast("double")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val first = when(lane < lit(cum.head) * lit(ShaLanes.LaneSpace),
      lit(splits.head._1))
    val chained = splits.tail.init.zip(cum.tail.init).foldLeft(first) {
      case (acc, ((name, _), c)) =>
        acc.when(lane < lit(c) * lit(ShaLanes.LaneSpace), lit(name))
    }
    df.withColumn("split", chained.otherwise(lit(splits.last._1)))
  }

  /**
   * Keep-latest version resolution: one row per key set, the first under
   * `order` (pass descending columns for "latest wins" — e.g. crawl
   * snapshots of the same URL). One shuffle on the keys; ties must be
   * broken by a unique column for determinism.
   */
  /**
   * Reproducible epoch shuffle + shard assignment — the training-data
   * LOADER primitive: each epoch needs a different but EXACTLY
   * reproducible global permutation of the corpus, served as shards a
   * data-parallel trainer can stream independently. Seeding the SHA lane
   * with the epoch number gives a fresh permutation per epoch with zero
   * RNG state; `shard = lane mod nShards` places each doc, and the
   * within-shard position is a per-shard `row_number` over the lane —
   * so the "global shuffle" costs ONE shuffle by shard and per-shard
   * local sorts, never a global sort. Stable across runs, engines and
   * cluster sizes (the [[hashSample]] argument); a 60-bit lane makes
   * position collisions vanishing, and the id tiebreak makes order total
   * regardless. At 100 TB, `nShards` should be ≥ a few × the executor
   * count so the per-shard sorts stay in memory — the shard count is the
   * parallelism knob, not a correctness one.
   */
  def epochShuffle(df: DataFrame, idCol: Column, epoch: Int,
                   nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards >= 1")
    val lane = ShaLanes.lane(
      concat(lit(s"epoch$epoch|"), idCol.cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__lane"), idCol)
    df.withColumn("__lane", lane)
      .withColumn("shard", pmod(col("__lane"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__lane")
  }

  def keepLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Corpus mixing: realize target source proportions under a total token
   * budget — the data-mixing step of a pretraining corpus build (e.g.
   * 30% web / 30% code / 40% books of an N-token budget). Per-source
   * keep-rates are derived from one tiny aggregate (source token totals,
   * collected — #sources rows, the Pack-width size class):
   * `rate_s = min(1, weight_s · budget / tokens_s)`; rows are then kept
   * by the [[hashSample]] lane filter at their source's rate — pure
   * scan-side, deterministic, no shuffle of the corpus, and a source
   * whose corpus is smaller than its target allocation is simply taken
   * whole (rate capped at 1 — standard under-sampling behavior; weights
   * need not sum to 1, absent sources rate 0).
   */
  def mixByTokenBudget(df: DataFrame, keyCol: Column, sourceCol: Column,
                       tokensCol: Column, weightOf: String => Double,
                       budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    // a source whose token sum is NULL (every row NULL-tokened) has no
    // budgetable mass — leave it out, which rates it 0 like an unknown
    // source
    val totals = df.groupBy(sourceCol.as("source"))
      .agg(sum(tokensCol.cast("long")).as("t"))
      .collect()
      .flatMap(r => if (r.isNullAt(1)) None
                    else Some(r.getString(0) -> r.getLong(1))).toMap
    val rates = totals.map { case (s, t) =>
      s -> math.min(1.0, weightOf(s) * budgetTokens.toDouble / t.toDouble)
    }
    require(rates.values.forall(_ >= 0), "weights must be non-negative")
    // disjoint equality conditions: fold order over the map is irrelevant
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(sourceCol === s, lit(r)).otherwise(acc)
    }
    hashSample(df, keyCol, rate)
  }

  /** Map form: absent sources rate 0. */
  def mixByTokenBudget(df: DataFrame, keyCol: Column, sourceCol: Column,
                       tokensCol: Column, weights: Map[String, Double],
                       budgetTokens: Long): DataFrame =
    mixByTokenBudget(df, keyCol, sourceCol, tokensCol,
      (s: String) => weights.getOrElse(s, 0.0), budgetTokens)

  /**
   * Deterministic negative sampling for contrastive training pairs: for
   * every anchor row, `k` pseudo-random partner ids drawn by SHA-lane
   * arithmetic over (anchor id, draw index) modulo the id-space size —
   * scan-side generation (one Generate, no RNG state, no shuffle), then
   * one equi-join against the id table to keep only partners that exist
   * (and never the anchor itself). Reproducible across runs, engines and
   * cluster sizes like every lane-based operator here; at 100 TB the
   * candidate join is a join on ids only — payloads are attached by the
   * caller, and near-dup collisions are filtered downstream against the
   * dedup pair graph ([[graft.operators.Dedup]]), not here.
   *
   * `idSpace` bounds the draw range (pass the max id + 1; ids need not be
   * dense — non-existent draws are dropped by the join, so the realized
   * count per anchor is ≤ k).
   */
  def negativeSamples(df: DataFrame, idCol: String, k: Int,
                      idSpace: Long): DataFrame = {
    require(k >= 1 && idSpace >= 2, s"need k >= 1, idSpace >= 2")
    val draws = df.select(col(idCol).as("anchor"))
      .select(col("anchor"), explode(array((0 until k).map(lit): _*)).as("j"))
      .select(col("anchor"), col("j"),
        pmod(ShaLanes.lane(concat(lit("neg|"), col("anchor").cast("string"),
          lit(","), col("j").cast("string"))), lit(idSpace)).as("neg_id"))
      .filter(col("neg_id") =!= col("anchor"))
    draws.join(df.select(col(idCol).as("neg_id")), Seq("neg_id"))
      .select(col("anchor"), col("j").cast("long").as("j"), col("neg_id"))
  }

  /**
   * Per-group quota: cap each group at its first `n` rows in `orderCol`
   * order (source/domain balancing — no single crawl domain may dominate
   * the corpus). Emits the within-group rank as `rk`. Catalyst rewrites
   * the rank-filter into WindowGroupLimit, so each partition retains at
   * most n rows per group before the shuffle.
   */
  def perGroupQuota(df: DataFrame, groupCol: Column, orderCol: Column,
                    n: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
  }

  /**
   * Deterministic WEIGHTED sampling without replacement: per group, the
   * `k` rows with the smallest exponential race keys
   * `-ln(u) / w` where `u` is the row's SHA-lane uniform in (0, 1] and
   * `w` its weight — the Efraimidis–Spirakis / exponential-clocks scheme
   * (each row is selected with probability proportional to `w` among the
   * not-yet-taken), here with the lane draw standing in for the RNG so
   * the sample is reproducible across runs, engines and cluster sizes
   * like every lane-based operator in this file.
   *
   * Scale shape: the key is a pure scan-side projection and the rank
   * filter compiles to WindowGroupLimit, so each map partition retains at
   * most `k` rows per group before the single group-keyed shuffle —
   * the weighted analog of [[perGroupQuota]]. Rows with NULL or
   * non-positive weight carry no mass and are dropped.
   *
   * Emits the input columns plus `rk` (1-based rank within the group).
   */
  def weightedSample(df: DataFrame, keyCol: Column, groupCol: Column,
                     weightCol: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    // (lane + 1) / 2^60 ∈ (0, 1]: never ln(0), and u = 1 → key 0 (first)
    val u = (ShaLanes.lane(keyCol.cast("string")).cast("double") + lit(1.0)) /
      lit(ShaLanes.LaneSpace)
    val key = -log(u) / weightCol.cast("double")
    val w = Window.partitionBy(groupCol).orderBy(col("__race").asc, keyCol)
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("__race", key)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .drop("__race")
  }

  /**
   * Fixed-BUDGET stratified sample with exact largest-remainder
   * allocation: exactly `total` rows overall, each stratum receiving
   * floor(total·n_h/N) rows plus one of the `total − Σfloor` leftover
   * units, assigned to the strata with the largest allocation
   * remainders (ties: stratum key ascending) — Hamilton apportionment.
   * The within-stratum pick is the `alloc_h` smallest SHA lanes (prefix
   * `"strat|"`), reproducible across runs, engines and cluster sizes
   * like every lane-based operator in this file. Contrast the file's
   * other samplers: [[hashSample]]'s Bernoulli rate makes the sample
   * SIZE binomially distributed and [[weightedSample]] takes a constant
   * k per group — the budget here is exact end-to-end, the eval-set
   * construction contract ("exactly 10k docs, proportional by
   * language").
   *
   * Scale shape: one grouped count whose result is #strata rows —
   * governance-metadata-sized, collected to the driver for the
   * apportionment (the bounded-collect class of the centroid/offset
   * collects; BigInt there, so no product overflow at any population ×
   * budget); allocations broadcast back; membership is one
   * stratum-keyed window whose per-group retention is ≤ its allocation,
   * so at most `total` rows survive the single shuffle.
   *
   * The stratum key is compared AS ITS STRING FORM (`cast string`) so
   * the driver-side sort, the broadcast join and the oracle's ORDER BY
   * agree on one collation; rows with a NULL stratum are EXCLUDED from
   * both population and sample (no defined allocation share). Emits
   * the input columns plus `rk` (1-based lane rank within the stratum,
   * ≤ the stratum's allocation).
   */
  def stratifiedExact(df: DataFrame, strataCol: String, idCol: Column,
                      total: Long): DataFrame = {
    require(total >= 0, s"budget must be non-negative, got $total")
    // a NULL stratum has no defined allocation share — exclude those
    // rows from both the population and the sample (the standard
    // stratified-sampling contract) instead of letting the driver-side
    // key sort NPE on a null string mid-apportionment
    val sdf = df.filter(col(strataCol).isNotNull)
      .withColumn("__stratum", col(strataCol).cast("string"))
    val counts = sdf.groupBy(col("__stratum"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val pop = counts.map(_._2).sum
    require(total <= pop, s"budget $total exceeds population $pop")
    val bt = BigInt(total)
    val base = counts.map { case (k, nh) =>
      (k, (bt * nh / pop).toLong, bt * nh % pop) }
    val deficit = total - base.map(_._2).sum
    val alloc = base
      .sortWith { case ((ka, _, ra), (kb, _, rb)) =>
        ra > rb || (ra == rb && ka < kb) }
      .zipWithIndex
      .map { case ((k, b, _), i) => (k, if (i < deficit) b + 1L else b) }
    import sdf.sparkSession.implicits._
    val allocDf = alloc.toSeq.toDF("__stratum", "__alloc")
    val w = Window.partitionBy(col("__stratum")).orderBy(col("__lane"), idCol)
    sdf.join(broadcast(allocDf), "__stratum")
      .withColumn("__lane",
        ShaLanes.lane(concat(lit("strat|"), idCol.cast("string"))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= col("__alloc"))
      .drop("__stratum", "__alloc", "__lane")
  }

  /**
   * DSIR-style importance weighting (Data Selection via Importance
   * Resampling, Xie et al. 2023): score each document by how much more
   * likely its hashed n-gram features are under a TARGET slice of the
   * corpus than under the raw corpus —
   * `avg_f [ ln p_target(f) − ln p_raw(f) ]` over the doc's distinct
   * feature buckets, add-α smoothed. High scores mean "looks like the
   * target domain"; feed the weight into [[hashSample]]-style resampling.
   *
   * Features are word n-grams hashed into `buckets` SHA-lane buckets
   * ([[ShaLanes]] so the oracle rebuilds them bit-identically), deduped
   * per document INSIDE the array (scan-side) before any shuffle. Both
   * doc-frequency distributions come from ONE aggregate pass over the
   * corpus (the target count is a conditional sum riding the raw count's
   * shuffle) whose result is ≤ `buckets` rows — small enough to COLLECT
   * by construction at any corpus scale (the centroid-matrix /
   * broadcast-threshold argument), so the per-bucket log-ratios ride
   * back into the scoring scan as a map literal and scoring is a pure
   * scan-side projection: zero joins, zero shuffles, one corpus re-scan.
   *
   * Returns (id, is_target, n_feats, dsir_logweight) for every doc with
   * at least one n-gram (docs shorter than n tokens have no features and
   * are absent — they carry no evidence either way). `dsir_logweight`
   * accumulates in the doc's feature order (bit-reproducible; the oracle
   * differs only by sum order, absorbed by round-4 like q23/q66).
   */
  /** DSIR step 2 — importance RESAMPLING: accept each weighted doc with
    * probability `sigmoid(temperature × dsir_logweight)` via the same
    * deterministic SHA-lane draw as [[hashSample]] (no RNG state,
    * reproducible across runs/engines/cluster sizes). `weighted` is
    * [[dsirWeights]]' output (or anything carrying `idCol` +
    * `dsir_logweight`); the pure scan-side filter composes directly on
    * it, so the whole select-and-cut is weights' plan + one projection.
    * Temperature sharpens the near-zero log-ratios into a real
    * acceptance spread (σ(T·w)); T=0 degenerates to rate-0.5 sampling. */
  def dsirResample(weighted: DataFrame, idCol: String,
                   temperature: Double): DataFrame = {
    val p = lit(1.0) /
      (lit(1.0) + exp(col("dsir_logweight") * lit(-temperature)))
    weighted
      .withColumn("p_accept", round(p, 6))
      .filter(ShaLanes.lane(concat(lit("resample|"), col(idCol).cast("string")))
        .cast("double") < p * lit(ShaLanes.LaneSpace))
  }

  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, n: Int = 2, buckets: Int = 1024,
                  alpha: Double = 0.5): DataFrame = {
    import graft.functions.Text
    // featurize ONCE: the SHA-lane digest per n-gram is the pipeline's
    // priciest per-row math and BOTH the counts pass and the scoring
    // scan read `bs` — materialize the (id, is_target, bucket-array)
    // frame (longs, far smaller than the text it came from; the q62
    // stage-boundary-a-100TB-run-would-persist argument) instead of
    // re-tokenizing and re-hashing the whole corpus for the second pass
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), isTarget.as("is_target"),
        array_distinct(transform(
          Text.shingles(Text.tokens(col(textCol)), n),
          f => pmod(ShaLanes.lane(f), lit(buckets.toLong)))).as("bs"))
      .localCheckpoint()
    // one corpus pass → ≤ `buckets` rows → driver
    val counts = base.select(col("is_target"), explode(col("bs")).as("b"))
      .groupBy(col("b")).agg(
        count(lit(1)).as("c_raw"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("c_tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nRaw = counts.map(_._2).sum.toDouble
    val nTgt = counts.map(_._3).sum.toDouble
    val aB = alpha * buckets
    val ratio: Map[Long, Double] = counts.map { case (b, cRaw, cTgt) =>
      b -> (math.log((cTgt + alpha) / (nTgt + aB)) -
            math.log((cRaw + alpha) / (nRaw + aB)))
    }.toMap
    // every bucket in any doc's array appeared in the counts pass (same
    // corpus, same projection), so the lookup can never miss
    val m = typedlit(ratio)
    base.filter(size(col("bs")) > 0)
      .select(col("id").as(idCol), col("is_target"),
        size(col("bs")).cast("long").as("n_feats"),
        round(aggregate(col("bs"), lit(0.0),
          (acc, b) => acc + element_at(m, b)) / size(col("bs")), 4)
          .as("dsir_logweight"))
  }

  /**
   * Group-aware k-fold assignment — the leakage-safe cross-validation
   * split: EVERY row of a group (a user's events, a source's documents,
   * a near-dup cluster) lands in the SAME fold, because the fold is a
   * pure function of the GROUP key, `pmod(shaLane("fold|" + group), k)`
   * — scikit-learn's GroupKFold contract, derived instead of assigned.
   * Splitting rows independently leaks group-correlated signal from
   * train into validation (the classic inflated-eval bug); deriving the
   * fold from the group key makes leakage structurally impossible, and
   * keeps the assignment stable across runs, engines, cluster sizes and
   * corpus growth (a group's fold never changes when OTHER groups
   * arrive — the [[hashSample]] admission property applied to splits).
   *
   * SHA lane ([[graft.functions.ShaLanes]]) so the oracle rebuilds every
   * assignment bit-identically. Scan-side projection, zero shuffles,
   * zero joins — the fold column costs one digest per row.
   *
   * Fold sizes are multinomial around n/k (hash uniformity), NOT exactly
   * balanced — by design: exact balance requires global coordination
   * that breaks the stability property above; budget-exact selection is
   * [[stratifiedExact]]'s job.
   */
  def groupKFold(df: DataFrame, group: Column, k: Int,
                 foldName: String = "fold"): DataFrame = {
    require(k >= 2 && k <= 1000, s"k in [2, 1000], got $k")
    df.withColumn(foldName,
      pmod(ShaLanes.lane(concat(lit("fold|"), group.cast("string"))),
        lit(k.toLong)))
  }
}
