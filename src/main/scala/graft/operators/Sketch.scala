package graft.operators

import graft.functions.ShaLanes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * KMV (k-minimum-values, "bottom-k") distinct-count sketch.
 *
 * Values hash to 60-bit lanes uniform in [0, 2^60); per group the k
 * smallest distinct lanes are kept and the estimate is `(k-1) / u_k` with
 * `u_k = (lane_k + 1) / (2^60 + 1)` (classic KMV, RSE ≈ 1/√(k−2)).
 * Groups with fewer than k distinct lanes are exact by construction.
 *
 * Two formulations, identical estimates by construction:
 *  - [[kmvDistinctSketch]] — the scale path: a
 *    [[graft.functions.expressions.KmvSketch]] TypedImperativeAggregate
 *    whose partial state is the k-long bound itself, so map-side combine
 *    ships ≤ k longs per group per partition;
 *  - [[kmvDistinct]] — the window-rank executable spec (shuffles every
 *    distinct lane before pruning; kept as the cross-check and the shape
 *    the DuckDB oracle mirrors).
 *
 * Lane choice: [[shaLane]] is the oracle-parity hash (SHA-256, DuckDB
 * bit-identical — see [[ShaLanes]]); [[xxLane]] is the cheaper xxhash64
 * lane for production pipelines that don't need a SQL oracle.
 */
object Sketch {

  /** Oracle-parity 60-bit lane of a value (SHA-256 derived). */
  def shaLane(value: Column): Column = ShaLanes.lane(value.cast("string"))

  /** xxhash64-derived lane in the same [0, 2^60) space (scale path). */
  def xxLane(value: Column): Column = shiftrightunsigned(xxhash64(value), 4)

  private def estimate(nKept: Column, maxLane: Column, k: Int): Column =
    when(nKept < k, nKept.cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        ((maxLane.cast("double") + lit(1.0)) / lit(ShaLanes.LaneSpace + 1.0)))

  /** Window-rank KMV (executable spec / oracle twin): distinct lanes per
    * group, rank, keep k smallest, estimate. */
  def kmvDistinct(df: DataFrame, keys: Seq[String], laneCol: Column,
                  k: Int = 256): DataFrame = {
    require(k >= 3, "KMV needs k >= 3")
    // NULL lanes would sort first and consume a kept slot; the KmvSketch
    // aggregate ignores NULL inputs, so the spec must too.
    val hashed = df.select((keys.map(col) :+ laneCol.as("lane")): _*)
      .filter(col("lane").isNotNull).distinct()
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("lane").asc)
    hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("lane")).as("lane_k"))
      .select((keys.map(col) :+
        round(estimate(col("n_kept"), col("lane_k"), k), 4).as("est_distinct")): _*)
  }

  /** Truncate a (keys…, lane) set to each group's k SMALLEST distinct
    * lanes — the persistable KMV state, and the step that makes the
    * sketch INCREMENTALLY MAINTAINABLE as a mart: k-minima are exact
    * under merge-truncate (`kmin(kmin(A) ∪ B) = kmin(A ∪ B)` — every
    * lane the left side drops is larger than k survivors, so it can
    * never re-enter the union's k-minima), which is what lets q210
    * fold per-batch lane sets into a ≤ k-rows-per-group state table
    * and still read back the EXACT whole-history estimate.
    *
    * r16 shape: ONE [[graft.functions.expressions.KmvLanes]] aggregate
    * (k-bounded TreeSet state, map-side partial) exploded back to rows,
    * replacing the old distinct+window form — that shape shuffled EVERY
    * distinct (key, lane) pair and then ranked them all inside one task
    * per group; the mergeable aggregate's shuffle carries ≤ k lanes per
    * group per partition and dedupes en route (the TreeSet is a set).
    * Same rows out (each group's k smallest distinct lanes) — the
    * SketchSpec merge-truncate property pins the equality. */
  def kmvTruncate(df: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    require(k >= 3, "KMV needs k >= 3")
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    df.select((keys.map(col) :+ col("lane")): _*)
      .filter(col("lane").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(call_function("graft_kmv_lanes", col("lane"), lit(k)).as("__lanes"))
      .select((keys.map(col) :+ explode(col("__lanes")).as("lane")): _*)
  }

  /** The readout half of the maintained-state path: estimate distinct
    * counts from a [[kmvTruncate]] state table — same estimator dag as
    * [[kmvDistinct]], so a maintained state reads back bit-identically
    * to the batch form over the same lanes. */
  def kmvEstimateFromState(state: DataFrame, keys: Seq[String],
                           k: Int): DataFrame =
    state.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("lane")).as("lane_k"))
      .select((keys.map(col) :+
        round(estimate(col("n_kept"), col("lane_k"), k), 4)
          .as("est_distinct")): _*)

  /** Mergeable-sketch KMV (scale path): per-group state is k longs,
    * partial aggregation map-side — the plan shows ObjectHashAggregate
    * with a partial merge, and the shuffle never carries more than k
    * lanes per group per partition. */
  def kmvDistinctSketch(df: DataFrame, keys: Seq[String], laneCol: Column,
                        k: Int = 256): DataFrame = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    df.groupBy(keys.map(col): _*)
      .agg(round(call_function("graft_kmv", laneCol, lit(k)), 4).as("est_distinct"))
  }

  /**
   * Count-Min Sketch frequency counters over a value column (the third
   * sketch of the family: KMV = distinct count, `percentile_approx` =
   * quantiles, CMS = per-key frequency). The native
   * [[graft.functions.expressions.CmsSketch]] aggregate holds ONE d×w
   * long matrix per partition and merges by elementwise add — the shuffle
   * carries O(d·w) regardless of how many distinct values stream through,
   * vs a full `groupBy(value)` whose state is the distinct-value set.
   * Returns the non-empty counters exploded to `(j, bucket, cnt)` rows.
   *
   * CMS is a linear sketch, so these counters are bit-equal to the
   * explode+groupBy twin ([[cmsCountersSql]]) under ANY row order or
   * partitioning — which is what makes the SHA family DuckDB-oracle-able
   * (q52) and the spec cross-check exact rather than approximate.
   */
  def cmsCounters(df: DataFrame, value: Column, d: Int = 4, w: Int = 64,
                  sha: Boolean = false): DataFrame = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    val fn = if (sha) "graft_cms_sha" else "graft_cms"
    df.agg(call_function(fn, value, lit(d), lit(w)).as("m"))
      .select(posexplode(col("m")).as(Seq("j", "row")))
      .select(col("j").cast("long").as("j"),
        posexplode(col("row")).as(Seq("bucket", "cnt")))
      .select(col("j"), col("bucket").cast("long").as("bucket"), col("cnt"))
      .filter(col("cnt") > 0)
  }

  /** Explode+groupBy CMS counters (the executable spec for [[cmsCounters]],
    * and the shape the q52 DuckDB oracle runs): one (j, bucket) row per
    * value × sketch row, counted. Shuffles every value occurrence — the
    * small-scale twin, not the scale path. */
  def cmsCountersSql(df: DataFrame, value: Column, d: Int = 4, w: Int = 64,
                     sha: Boolean = false): DataFrame = {
    def bucketOf(j: Int, v: Column): Column =
      if (sha) pmod(ShaLanes.lane(concat(lit(s"$j|"), v)), lit(w.toLong))
      else pmod(shiftrightunsigned(xxhash64(lit(j), v), 4), lit(w.toLong))
    val rows = (0 until d).map(j =>
      struct(lit(j.toLong).as("j"), bucketOf(j, col("v")).as("bucket")))
    df.select(value.as("v")).filter(col("v").isNotNull)
      .select(explode(array(rows: _*)).as("e"))
      .groupBy(col("e.j").as("j"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a `(j, bucket, cnt)` counters frame: for each
    * key, `min_j cnt` over its d buckets (absent buckets count 0). The
    * COUNTERS side is broadcast (bounded at d×w rows by construction) —
    * estimating is a lookup against the probe scan, never a shuffle of
    * either side. */
  def cmsEstimate(counters: DataFrame, keys: DataFrame, key: Column,
                  d: Int = 4, w: Int = 64, sha: Boolean = false): DataFrame = {
    def bucketOf(j: Int, v: Column): Column =
      if (sha) pmod(ShaLanes.lane(concat(lit(s"$j|"), v)), lit(w.toLong))
      else pmod(shiftrightunsigned(xxhash64(lit(j), v), 4), lit(w.toLong))
    val rows = (0 until d).map(j =>
      struct(lit(j.toLong).as("j"), bucketOf(j, col("k")).as("bucket")))
    val probes = keys.select(key.as("k")).distinct()
      .select(col("k"), explode(array(rows: _*)).as("e"))
      .select(col("k"), col("e.j").as("j"), col("e.bucket").as("bucket"))
    // counters is bounded at d×w rows — broadcast THAT side (a broadcast
    // hint on the preserved side of an outer join can never build, so the
    // previous broadcast(probes)-into-right-outer shape only avoided a
    // shuffle when the planner happened to auto-broadcast the counters)
    probes.join(broadcast(counters), Seq("j", "bucket"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  // ----------------------------------------------------------------- HLL

  /** alpha_m for the HLL estimator — synchronized with
    * [[graft.functions.expressions.HllSketch.eval]] and the q104 oracle
    * SQL (SketchSpec cross-checks all three). */
  private def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** HLL distinct estimate from per-group `(bucket → max rho)` registers
    * (`keys :+ (bucket, r)` rows, [[hllRegisters]]'s shape): shared tail
    * of [[hllDistinct]], the q104 oracle SQL, and the streaming
    * merge-at-read path ([[graft.streaming.Streams.readDistinct]]). */
  def hllEstimateFromRegisters(regs: DataFrame, keys: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val raw = lit(hllAlpha(m)) * lit(m.toDouble) * lit(m.toDouble) /
      (col("present") + col("v"))
    val corrected = when(raw <= lit(2.5 * m) && col("v") > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
      .otherwise(raw)
    regs.groupBy(keys.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("r"))).as("present"),
        count(lit(1)).as("np"))
      .withColumn("v", (lit(m) - col("np")).cast("double"))
      .select((keys.map(col) :+ round(corrected, 4).as("est_distinct")): _*)
  }

  /** Window/groupBy HLL (executable spec / oracle twin of
    * [[hllDistinctSketch]]): derive `(bucket, rho)` per distinct lane,
    * max-reduce to registers, estimate. Shuffles every distinct lane —
    * the small-scale mirror, not the scale path. `bin()` (minimal binary
    * string, identical in DuckDB) gives floor(log2 w) exactly; a floating
    * `log2` would round UP just below powers of two at 50+ bits. */
  def hllDistinct(df: DataFrame, keys: Seq[String], laneCol: Column,
                  p: Int = 6): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, keys, laneCol, p), keys, p)

  /** Per-group HLL registers as `(keys..., bucket, r)` rows — ≤ 2^p rows
    * per group, r = max rho. Registers are the MERGEABLE form: registers
    * of a union = elementwise (per-bucket) MAX of the parts' registers,
    * and max is IDEMPOTENT — re-observing the same data cannot change
    * them, which is what makes the streaming delta table replay-proof
    * ([[graft.streaming.Streams.incrementalDistinct]]). */
  def hllRegisters(df: DataFrame, keys: Seq[String], laneCol: Column,
                   p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, "HLL needs 4 <= p <= 16")
    val wBits = 60 - p
    df.select((keys.map(col) :+ laneCol.as("lane")): _*)
      .filter(col("lane").isNotNull).distinct()
      .select((keys.map(col) :+
        shiftrightunsigned(col("lane"), wBits).as("bucket") :+
        col("lane").bitwiseAND(lit((1L << wBits) - 1)).as("w")): _*)
      .withColumn("rho", when(col("w") === 0, lit(wBits + 1))
        .otherwise(lit(wBits) - (length(bin(col("w"))) - lit(1))))
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** Mergeable HLL (scale path): per-group state is exactly 2^p BYTES —
    * constant in both cardinality and tuning, the smallest sketch in the
    * family (KMV ships k longs) — merged by elementwise register max
    * map-side. Identical estimates to [[hllDistinct]] by construction
    * (same registers, same estimator). */
  def hllDistinctSketch(df: DataFrame, keys: Seq[String], laneCol: Column,
                        p: Int = 6): DataFrame = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    df.groupBy(keys.map(col): _*)
      .agg(round(call_function("graft_hll", laneCol, lit(p)), 4).as("est_distinct"))
  }

  // --------------------------------------------------------- KMV overlap

  /**
   * Pairwise set-overlap estimation across a partition column (union /
   * Jaccard / intersection cardinalities between every pair of sources)
   * from composable KMV sketches: each source reduces to its bottom-k
   * lane array via [[graft.functions.expressions.KmvLanes]] (the corpus
   * shuffles ≤ k longs per source, ONCE), and every pair statistic is
   * array math on the sketches — `array_union`→sort→slice is the bottom-k
   * of A∪B (a lane in it that belongs to A is necessarily in A's own
   * bottom-k), the k-th smallest union lane gives |A∪B| by the KMV
   * estimator, and the fraction of union-bottom-k lanes present in BOTH
   * sketches estimates Jaccard; intersection = J·|A∪B|. Pairs with fewer
   * than k union lanes are exact by construction. The corpus is never
   * rescanned or re-shuffled per pair — the pair join touches only
   * (#sources × k) longs. Training-data use: corpus-mix planning and
   * cross-source contamination sizing without an O(n²) token join.
   */
  def kmvOverlap(df: DataFrame, sourceCol: String, laneCol: Column,
                 k: Int = 128): DataFrame = {
    require(k >= 3, "KMV needs k >= 3")
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    val sk = df.groupBy(col(sourceCol).as("src"))
      .agg(call_function("graft_kmv_lanes", laneCol, lit(k)).as("lanes"))
    val a = sk.select(col("src").as("src_a"), col("lanes").as("la"))
    val b = sk.select(col("src").as("src_b"), col("lanes").as("lb"))
    val ub = array_sort(array_union(col("la"), col("lb")))
    val nUnion = size(ub)
    val kk = least(lit(k), nUnion)
    val bot = slice(ub, lit(1), kk)
    val uk = element_at(bot, kk)
    val matches = size(array_intersect(array_intersect(bot, col("la")), col("lb")))
    val unionEst = when(nUnion < k, nUnion.cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        ((uk.cast("double") + lit(1.0)) / lit(ShaLanes.LaneSpace + 1.0)))
    // kk = 0 ⇔ both sketches are empty (a source whose lane column is
    // entirely NULL reduces to an empty lane array): the pair's union and
    // intersection are exactly empty, so report 0s instead of the 0/0 NaN
    // the estimator ratios would produce.
    val jac = when(kk === 0, lit(0.0))
      .otherwise(matches.cast("double") / kk.cast("double"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(unionEst, 4).as("est_union"),
        round(jac, 4).as("est_jaccard"),
        round(jac * unionEst, 4).as("est_intersection"))
  }

  /** Exact per-group quantiles (q37's oracle twin / executable spec).
    * `percentile` buffers EVERY group value in the aggregation buffer —
    * at 100 TB that is an OOM, not a slowdown, so this form is for
    * small-scale oracles and as the cross-check for [[quantilesApprox]].
    * `ps` maps output column name → percentage. */
  def quantilesExact(df: DataFrame, keys: Seq[String], value: Column,
                     ps: Seq[(String, Double)],
                     countName: String = "n"): DataFrame = {
    val aggs = count(lit(1)).as(countName) +:
      ps.map { case (nm, p) => round(percentile(value, lit(p)), 4).as(nm) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Approximate per-group quantiles — the scale path. `percentile_approx`
    * keeps a bounded mergeable summary per group (≤ O(accuracy) entries,
    * rank error ≤ n/accuracy), so map-side partial aggregation ships a
    * fixed-size state regardless of group cardinality — the same
    * buffer-bound argument as [[kmvDistinctSketch]] vs [[kmvDistinct]].
    * Cross-checked against [[quantilesExact]] in SketchSpec (error-bound
    * assertion); not oracled directly because approximate quantile
    * summaries are not bit-stable across engines. */
  def quantilesApprox(df: DataFrame, keys: Seq[String], value: Column,
                      ps: Seq[(String, Double)], accuracy: Int = 10000,
                      countName: String = "n"): DataFrame = {
    val aggs = count(lit(1)).as(countName) +:
      ps.map { case (nm, p) =>
        round(percentile_approx(value, lit(p), lit(accuracy)), 4).as(nm) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * EXACT heavy hitters (items with count·(k+1) > N) via the two-pass
   * Misra–Gries pattern: pass 1 streams every item through the mergeable
   * [[graft.functions.expressions.MisraGries]] summary (O(k) state per
   * partition, no false negatives above N/(k+1)) alongside the exact
   * total; pass 2 re-counts ONLY the ≤ k surviving candidates through a
   * broadcast semi-join, so the exact-count shuffle carries candidate
   * rows instead of the full item universe — the 100 TB alternative to
   * `groupBy(item)` over every distinct token ever seen. The threshold
   * compare is integer arithmetic (`cnt·(k+1) > N`), so the final answer
   * is exact and engine-independent despite the sketch in the plan.
   */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    val summary = items.agg(
      call_function("graft_misra_gries", col(itemCol), lit(k)).as("mg"),
      count(col(itemCol)).as("n_total"))
    val cands = summary.select(
      explode(map_keys(col("mg"))).as(itemCol), col("n_total"))
    items.join(broadcast(cands), itemCol)
      .groupBy(col(itemCol), col("n_total"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k + 1L) > col("n_total"))
      .select(col(itemCol), col("cnt"))
  }
}
