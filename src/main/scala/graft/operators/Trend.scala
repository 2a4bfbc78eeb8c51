package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series smoothing for the signal tier: the vigilance pipeline's
 * early-warning view flags deviations against a trailing window
 * (reference `v_ae_early_signals.sql` — rolling mean/stddev); EWMA is
 * the standard companion smoother that weights recent observations
 * higher instead of uniformly.
 *
 * [[ewma]] computes the NORMALIZED finite-history form over the last
 * `window` rows per key:
 *
 *   ewma_t = Σ_{k=0..n-1} 2^-k · x_{t-k}  /  Σ_{k=0..n-1} 2^-k
 *
 * α is fixed at 1/2 deliberately: every weight is a power of two, so
 * with integer inputs (cents) every product, both sums, and the closed-
 * form denominator `2 − 2^{1−n}` are EXACT doubles — the whole smoother
 * is bit-reproducible in any engine and q108 hash-matches a DuckDB
 * lag-chain oracle. (An arbitrary-α EWMA is the same code with pow(α,k);
 * it loses cross-engine bit-exactness, not correctness.)
 *
 * Plan shape: ONE key-partitioned ordered window (the frame feeds
 * `collect_list`, ≤ `window` elements per row), then scan-side array
 * math — no self-joins, no per-lag re-shuffle; the array never exceeds
 * `window` elements so memory per row is bounded.
 */
object Trend {

  /**
   * Robust per-group outlier statistics via the median absolute
   * deviation — the heavy-tail-safe companion to the rolling z-score
   * (one extreme month inflates a stddev and hides itself; it barely
   * moves a median): `med = median(x)`, `mad = median(|x − med|)`, and
   * an observation is flagged when its modified z-score
   * `0.6745·|x−med|/mad` exceeds `z` (Iglewicz–Hoberg convention;
   * compared in multiplied form `0.6745·dev > z·mad` so a degenerate
   * mad = 0 flags any nonzero deviation instead of dividing by zero).
   *
   * Three grouped passes by construction (MAD nests two medians), with
   * the tiny per-group medians broadcast back between passes — the
   * VALUE rows shuffle on the group key at most, never self-join.
   * Exact `percentile` buffers each group's values (the q37 caveat);
   * [[Sketch.quantilesApprox]] is the drop-in at unbounded group sizes.
   *
   * Output: keys, `n` (group size), `med`, `mad` (rounded 4),
   * `n_outliers`.
   */
  def robustOutlierStats(df: DataFrame, keys: Seq[String], value: Column,
                         z: Double = 3.5): DataFrame = {
    val base = df.select((keys.map(col) :+ value.cast("double").as("x")): _*)
    val med = base.groupBy(keys.map(col): _*)
      .agg(percentile(col("x"), lit(0.5)).as("med"))
    val dev = base.join(broadcast(med), keys)
      .withColumn("dev", abs(col("x") - col("med")))
    val mad = dev.groupBy(keys.map(col): _*)
      .agg(percentile(col("dev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), keys)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 4).as("med"),
        round(max(col("mad")), 4).as("mad"),
        sum(when(lit(0.6745) * col("dev") > lit(z) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /**
   * Seasonal-trend decomposition (STL-lite) for the signal tier: the
   * early-warning z-score (q08) flags deviations against a trailing
   * window, but a weekly-periodic series trips it every cycle — the
   * classical fix decomposes `n = trend + seasonal + residual` and
   * alarms on the residual. Trend is the centered moving average over
   * ±`halfWindow` observed points; seasonal is the mean detrended value
   * at each position-in-period; residual is what's left.
   *
   * Bit-exact across engines BY CONSTRUCTION (the [[ewma]] discipline,
   * extended): inputs are integer counts, so the frame sum is exact;
   * `trend = s/k` is ONE correctly-rounded division. The detrended
   * value is scaled by `L = lcm(1 .. 2·halfWindow+1)`: `L·n − (L/k)·s`
   * — `L/k` is an exact integer (k is a frame size, a divisor of L),
   * every term is an integer-valued double < 2^53, so the seasonal
   * GROUP SUM is exact in ANY accumulation order — the one place a
   * parallel engine normally loses float determinism. Seasonal and
   * residual then cost one division and two subtractions each, all
   * correctly rounded on identical operands. No round() crutch needed:
   * q159 hash-matches DuckDB on raw doubles.
   *
   * Plan shape: input is the already-aggregated (keys, day) series —
   * the 100 TB work happened in that upstream grouped count; here both
   * windows partition by the series keys (and key+position), so state
   * per task is one series' days. Day gaps: the frame is ROWS-based
   * over OBSERVED points (documented semantics; densify upstream with
   * the q99 date spine when calendar frames are wanted).
   */
  def seasonalDecompose(daily: DataFrame, keys: Seq[String], day: Column,
                        value: Column, period: Int = 7,
                        halfWindow: Int = 3): DataFrame = {
    require(period >= 2, "period >= 2")
    require(halfWindow >= 1 && halfWindow <= 10, "halfWindow in [1, 10]")
    @annotation.tailrec def gcd(a: Long, b: Long): Long =
      if (b == 0) a else gcd(b, a % b)
    val L = (1 to 2 * halfWindow + 1)
      .foldLeft(1L)((acc, i) => acc / gcd(acc, i) * i)
    val base = daily.select((keys.map(col) :+ day.cast("long").as("day") :+
      value.cast("long").as("n")): _*)
    val wf = Window.partitionBy(keys.map(col): _*).orderBy(col("day"))
      .rowsBetween(-halfWindow, halfWindow)
    val withTrend = base
      .withColumn("__s", sum(col("n")).over(wf).cast("double"))
      .withColumn("__k", count(col("n")).over(wf).cast("double"))
      .withColumn("trend", col("__s") / col("__k"))
      .withColumn("__det",
        lit(L.toDouble) * col("n") - (lit(L.toDouble) / col("__k")) * col("__s"))
      .withColumn("pos", pmod(col("day"), lit(period.toLong)))
    val ws = Window.partitionBy((keys :+ "pos").map(col): _*)
    withTrend
      .withColumn("seasonal",
        sum(col("__det")).over(ws) /
          (count(lit(1)).over(ws) * lit(L.toDouble)))
      .withColumn("residual", col("n") - col("trend") - col("seasonal"))
      .drop("__s", "__k", "__det")
  }

  /**
   * One-sided upper CUSUM changepoint detection — the sequential
   * complement to [[seasonalDecompose]] in the alarm tier: the q08
   * z-score asks "is today extreme?", CUSUM asks "has a small persistent
   * shift accumulated?" (the canonical detector for slow-onset signal
   * drift). The textbook recursion `C_t = max(0, C_{t-1} + x_t − μ0 − k)`
   * is not a window function, but its closed form is:
   * `C_t = S_t − min(S_0..S_t)` where `S_t` is the running sum of
   * deviations — so the whole detector is two ordered running windows
   * per series, fully declarative, no recursion anywhere.
   *
   * Exactness (the [[seasonalDecompose]] discipline): with integer
   * observations and a DYADIC target+slack (multiples of 1/16 —
   * enforced), every deviation is an exactly-representable double and
   * running sums add exactly in ANY order — immune even to an engine
   * that computes window sums with a segment tree instead of a
   * left-to-right scan. Outputs hash-match raw, unrounded.
   *
   * `target` is a per-row Column so callers choose the in-control mean
   * (a calibration-prefix mean, a seasonal baseline from
   * [[seasonalDecompose]], a constant); it must itself be dyadic-exact
   * for the exactness claim to carry (e.g. `floor(avg)` over a prefix —
   * one exact division, then floor).
   */
  def cusum(daily: DataFrame, keys: Seq[String], order: Column,
            value: Column, target: Column, slack: Double,
            threshold: Double): DataFrame = {
    require((slack * 16).isWhole, "slack must be a multiple of 1/16 " +
      "(dyadic — keeps every deviation an exact double)")
    require((threshold * 16).isWhole, "threshold must be a multiple of 1/16")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("__d", value.cast("double") - target - lit(slack))
      .withColumn("s", sum(col("__d")).over(w))
      // S_0 = 0 precedes every prefix: the running min is capped at 0
      .withColumn("cusum", col("s") - least(min(col("s")).over(w), lit(0.0)))
      .withColumn("alarm", col("cusum") > lit(threshold))
      .drop("__d")
  }

  /** NULL policy: a NULL observation contributes 0 but KEEPS its lag slot
    * (`coalesce` before the collect — `collect_list` alone would drop the
    * NULL and silently shift every older lag one position newer). This is
    * exactly the documented lag-chain semantics the q108 DuckDB oracle
    * computes, which coalesces each missing lag to 0. */
  def ewma(df: DataFrame, keys: Seq[String], order: Column, value: Column,
           window: Int = 8): DataFrame = {
    require(window >= 1 && window <= 53, "window in [1, 53] (exactness bound)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
      .rowsBetween(-(window - 1), Window.currentRow)
    // frame order is oldest→newest; reverse so index k is the lag
    val arr = reverse(collect_list(coalesce(value.cast("double"), lit(0.0))).over(w))
    val num = aggregate(
      transform(arr, (x, k) => x * pow(lit(2.0), -k)),
      lit(0.0), (acc, v) => acc + v)
    val den = lit(2.0) - pow(lit(2.0), -(size(arr) - lit(1)).cast("double"))
    df.withColumn("ewma", round(num / den, 4))
  }

  /**
   * Two-sided linear interpolation over a per-key integer time spine —
   * the gap-FILL sibling of the q125 forward-fill (which repeats the
   * last observation; this one draws the line between the bracketing
   * observations, the standard treatment for missing sensor/metric
   * points feeding a model):
   *
   *   v(t) = v_prev + (v_next − v_prev) · (t − t_prev) / (t_next − t_prev)
   *
   * Leading/trailing gaps (no observation on one side) carry the
   * nearest observation flat. `t` is an integer index (epoch day, epoch
   * hour…); `v` integer-valued. Exactness: the numerator products are
   * Long-exact, the single division and the final addition are
   * correctly-rounded ops on identical operands — deterministic
   * cross-engine with NO rounding lane (the q159/q160 discipline).
   *
   * Plan shape: one per-key min/max aggregate, a per-key `sequence`
   * explode for the spine (rows ∝ key count × range — the q99/q125
   * spine class), a co-keyed left join, and ONE key-partitioned window
   * evaluated in both frame directions (IGNORE NULLS last/first). At
   * 100 TB the spine is still |keys| × |days| — calendar-sized, never
   * fact-sized.
   *
   * Emits (keys…, `t`, observed, n, v_interp): `observed` ∈ {0,1},
   * `n` the raw observation (NULL on gap rows).
   */
  def interpolateLinear(observed: DataFrame, keys: Seq[String], t: Column,
                        v: Column): DataFrame = {
    val obs = observed.select(
      keys.map(col) :+ t.cast("long").as("__t") :+ v.cast("long").as("__v"): _*)
    val spine = obs.groupBy(keys.map(col): _*)
      .agg(min(col("__t")).as("__t0"), max(col("__t")).as("__t1"))
      .select(keys.map(col) :+
        explode(sequence(col("__t0"), col("__t1"))).as("__t"): _*)
    val joined = spine.join(obs, keys :+ "__t", "left")
    val back = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(col("__v"), ignoreNulls = true).over(back)
    val pt = last(when(col("__v").isNotNull, col("__t")), ignoreNulls = true)
      .over(back)
    val nv = first(col("__v"), ignoreNulls = true).over(fwd)
    val nt = first(when(col("__v").isNotNull, col("__t")), ignoreNulls = true)
      .over(fwd)
    val interp = when(col("__v").isNotNull, col("__v").cast("double"))
      .when(pv.isNull, nv.cast("double"))
      .when(nv.isNull, pv.cast("double"))
      .otherwise(pv.cast("double") +
        ((nv - pv) * (col("__t") - pt)).cast("double") /
          (nt - pt).cast("double"))
    joined.select(keys.map(col) :+ col("__t").as("t") :+
      col("__v").isNotNull.cast("long").as("observed") :+
      col("__v").as("n") :+ interp.as("v_interp"): _*)
  }

  /**
   * Sample autocorrelation function per key: Pearson correlation of the
   * series with itself at lags 1…`maxLag` — the seasonality/persistence
   * diagnostic read before trusting [[seasonalDecompose]]'s period or
   * [[ewma]]'s smoothing constant (a weekly-periodic series spikes at
   * lag 7; white noise shows nothing).
   *
   * One ordered window pass materializes ALL lag columns together (the
   * frame is just `maxLag` rows), a scan-side `stack` unpivots them to
   * (lag, value, lagged) rows, and one grouped `corr` per (key, lag)
   * finishes — `corr` drops pairs whose lagged side is NULL (the first
   * k rows), so every lag sees exactly its n−k aligned pairs. Like
   * q161's regression family the correlation accumulates moments, so it
   * is rounded 6dp. Assumes the series is regular (one row per tick) —
   * gap-bearing series go through [[interpolateLinear]] first.
   *
   * Emits (keys…, lag, n_pairs, acf).
   */
  def acf(df: DataFrame, keys: Seq[String], t: Column, v: Column,
          maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag in [1, 64], got $maxLag")
    val base = df.select(keys.map(col) :+ t.as("__t") :+
      v.cast("double").as("__v"): _*)
    val lagged = (1 to maxLag).foldLeft(base) { (acc, k) =>
      acc.withColumn(s"__l$k",
        lag(col("__v"), k).over(Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t"))))
    }
    val pairs = (1 to maxLag).map(k => s"${k}L, __l$k").mkString(", ")
    // Pearson assembled from covar/stddev aggregates instead of corr():
    // ANSI-mode corr() throws DIVIDE_BY_ZERO on a zero-variance series,
    // where the statistic is undefined and NULL is the right answer.
    // The sample-(n−1) factors cancel, so this IS Pearson r; the
    // conditional stddev restricts the v side to the aligned pairs
    // exactly as corr() would.
    lagged
      .select(keys.map(col) :+ col("__v") :+
        expr(s"stack($maxLag, $pairs)").as(Seq("lag", "lagged")): _*)
      .groupBy(keys.map(col) :+ col("lag"): _*)
      .agg(count(col("lagged")).as("n_pairs"),
        covar_samp(col("__v"), col("lagged")).as("__cov"),
        stddev_samp(when(col("lagged").isNotNull, col("__v"))).as("__sv"),
        stddev_samp(col("lagged")).as("__sl"))
      .select(keys.map(col) :+ col("lag") :+ col("n_pairs") :+
        when(col("__sv") > 0 && col("__sl") > 0,
          round(col("__cov") / (col("__sv") * col("__sl")), 6)).as("acf"): _*)
  }

  /**
   * Time-weighted average per key — the irregular-sampling mean: each
   * observation carries its value until the NEXT observation, so
   *
   *   twap = Σ vᵢ·Δtᵢ / Σ Δtᵢ ,  Δtᵢ = tᵢ₊₁ − tᵢ
   *
   * (the metric a row-weighted `avg` silently gets wrong whenever
   * sampling density correlates with the value — the standard
   * finance/telemetry correction). The last observation per key has no
   * duration and carries no weight.
   *
   * One key-partitioned ordered window (`lead`) and one grouped
   * reduction. `t` must be an integer clock (epoch micros/seconds);
   * ties order by `tieBreak` so Δt is well-defined on simultaneous
   * rows. The products v·Δt are single correctly-rounded ops, but
   * their SUM accumulates — round-6 lane like every such aggregate.
   * Emits (keys…, n_intervals, total_dt, twap).
   */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], t: Column, v: Column,
                      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(t, tieBreak)
    val dt = (lead(t, 1).over(w) - t).cast("long")
    df.select(keys.map(col) :+ v.cast("double").as("__v") :+ dt.as("__dt"): _*)
      .filter(col("__dt").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dt")).as("total_dt"),
        round(sum(col("__v") * col("__dt").cast("double")) /
          sum(col("__dt")).cast("double"), 6).as("twap"))
  }

  /**
   * Theil–Sen robust slope per key — the median of all pairwise slopes
   * `(v_j − v_i)/(t_j − t_i)`, the outlier-immune companion to q161's
   * least-squares trend (one corrupted month swings an OLS slope; it
   * cannot move a median until 29% of the data is bad — the classic
   * breakdown-point argument for monitoring data).
   *
   * Exactness end to end, with NO float division anywhere:
   *  - each pair's slope is kept in integer MICRO-units via a
   *    sign-correct FLOOR division `(a − pmod(a, dx)) div dx` with
   *    `a = 10⁶·dv` — pmod makes the floor explicit, so Spark's
   *    truncating `div` and an oracle's floor `//` agree on negative
   *    slopes (dx > 0 always: pairs are generated with t_i < t_j);
   *  - the median is the LOWER median (rank ⌈n/2⌉ of the sorted slopes)
   *    — a VALUE SELECTION, not an average, so it stays an exact Long.
   *
   * Plan shape: pairs come from a key-co-partitioned self-join with
   * `t_i < t_j` — O(n²) in each SERIES' length (documented bound: feed
   * pre-aggregated series — monthly/weekly points — not raw facts; 120
   * months is 7k pairs, trivially partition-local), never in the table
   * size; the median is one ordered rank per key over those pairs.
   *
   * Emits (keys…, n_points, n_pairs, slope_micro) — slope in units of
   * 10⁻⁶ value per time tick, floor-rounded.
   */
  /**
   * Two-feature ordinary least squares per group — the multivariate
   * step past q161's built-in `regr_slope` family (which is strictly
   * bivariate): fit `y = b0 + b1·x1 + b2·x2` by solving the 3×3 normal
   * equations with Cramer's rule over the SUFFICIENT-STATISTIC moments
   *
   *   n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y
   *
   * — the classic one-pass distributed regression: the facts reduce to
   * nine numbers per group in a single grouped aggregate (map-side
   * partials), and the solve is scan-side arithmetic on the group rows.
   * No matrix library, no second pass, no driver math.
   *
   * Exactness: with integer-valued inputs every moment is an exact Long
   * (ANSI overflow-checked, never silently wrapped); the determinants
   * are a fixed dag of correctly-rounded double ops on identical
   * operands — bit-identical cross-engine — and the betas ride the
   * round-6 lane. A collinear/degenerate group (determinant 0) yields
   * NULL betas rather than an ANSI divide error.
   *
   * Emits (keys…, n, b0, b1, b2).
   */
  def ols2(df: DataFrame, keys: Seq[String], x1: Column, x2: Column,
           y: Column): DataFrame = {
    val base = df.select(keys.map(col) :+ x1.cast("long").as("__x1") :+
      x2.cast("long").as("__x2") :+ y.cast("long").as("__y"): _*)
    val m = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x1")).as("s1"), sum(col("__x2")).as("s2"),
        sum(col("__y")).as("sy"),
        sum(col("__x1") * col("__x1")).as("s11"),
        sum(col("__x2") * col("__x2")).as("s22"),
        sum(col("__x1") * col("__x2")).as("s12"),
        sum(col("__x1") * col("__y")).as("s1y"),
        sum(col("__x2") * col("__y")).as("s2y"))
    def d(c: String): Column = col(c).cast("double")
    // det of [[n s1 s2][s1 s11 s12][s2 s12 s22]] and the three
    // right-hand-side column replacements (Cramer)
    def det3(a1: Column, a2: Column, a3: Column,
             b1: Column, b2: Column, b3: Column,
             c1: Column, c2: Column, c3: Column): Column =
      a1 * (b2 * c3 - b3 * c2) - a2 * (b1 * c3 - b3 * c1) +
        a3 * (b1 * c2 - b2 * c1)
    val det = det3(d("n"), d("s1"), d("s2"),
      d("s1"), d("s11"), d("s12"), d("s2"), d("s12"), d("s22"))
    val det0 = det3(d("sy"), d("s1"), d("s2"),
      d("s1y"), d("s11"), d("s12"), d("s2y"), d("s12"), d("s22"))
    val det1 = det3(d("n"), d("sy"), d("s2"),
      d("s1"), d("s1y"), d("s12"), d("s2"), d("s2y"), d("s22"))
    val det2 = det3(d("n"), d("s1"), d("sy"),
      d("s1"), d("s11"), d("s1y"), d("s2"), d("s12"), d("s2y"))
    m.select(keys.map(col) :+ col("n") :+
      when(det =!= 0.0, round(det0 / det, 6)).as("b0") :+
      when(det =!= 0.0, round(det1 / det, 6)).as("b1") :+
      when(det =!= 0.0, round(det2 / det, 6)).as("b2"): _*)
  }

  /**
   * M4 time-series downsampling — the error-free visualization reducer
   * (Jugel et al., VLDB 2014): per key, the time range splits into
   * `buckets` equal bins and each bin keeps exactly the four points a
   * pixel column can show — first, last, min, max — so a line chart
   * over the reduced series renders IDENTICALLY to one over the raw
   * series. The standard way to ship a 10⁹-point series to a dashboard
   * as ~4·width rows.
   *
   * Determinism under duplicate timestamps: a pre-aggregate collapses
   * (key, bin, t) to that tick's min/max value first, so the
   * first/last selection (`min/max(struct(t, v))` — lexicographic on
   * exact integers) is over UNIQUE timestamps and has no tie to break;
   * the oracle's arg_min/arg_max over the same collapsed grid is then
   * unambiguous too. All columns integer-exact; no rounding lane.
   *
   * Plan shape: one per-key bounds aggregate broadcast back (the q121
   * bounds idiom), then two grouped passes — nothing wider than the
   * series, no window, no join beyond the scalar fold.
   *
   * Emits (keys…, bin, n, t_first, v_first, t_last, v_last, v_min,
   * v_max).
   */
  def m4Downsample(df: DataFrame, keys: Seq[String], t: Column, v: Column,
                   buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = df.select(keys.map(col) :+ t.cast("long").as("__t") :+
      v.cast("long").as("__v"): _*)
    val bounds = base.groupBy(keys.map(col): _*)
      .agg(min(col("__t")).as("__t0"), max(col("__t")).as("__t1"))
    // integer floor division (operands non-negative, so Spark's
    // truncating div IS floor and matches the oracle's //)
    val binned = base.join(broadcast(bounds), keys)
      .withColumn("bin",
        expr(s"((__t - __t0) * ${buckets}L) div (__t1 - __t0 + 1L)"))
    val perTick = binned.groupBy(keys.map(col) :+ col("bin") :+
        col("__t"): _*)
      .agg(count(lit(1)).as("__c"), min(col("__v")).as("__lo"),
        max(col("__v")).as("__hi"))
    m4FromTicks(perTick, keys)
  }

  /** The derivation half of [[m4Downsample]], over the per-tick cell
    * grid `(keys…, bin, __t, __c, __lo, __hi)` — the grid is MERGEABLE
    * state (counts sum; tick min/max re-min/max), which is what lets
    * q200 maintain it incrementally under replay over a fixed viewport
    * and run this same derivation over the maintained mart. */
  def m4FromTicks(perTick: DataFrame, keys: Seq[String]): DataFrame =
    perTick.groupBy(keys.map(col) :+ col("bin"): _*)
      .agg(sum(col("__c")).as("n"),
        min(struct(col("__t"), col("__lo"))).as("__f"),
        max(struct(col("__t"), col("__hi"))).as("__l"),
        min(col("__lo")).as("v_min"), max(col("__hi")).as("v_max"))
      .select(keys.map(col) :+ col("bin") :+ col("n") :+
        col("__f.__t").as("t_first") :+ col("__f.__lo").as("v_first") :+
        col("__l.__t").as("t_last") :+ col("__l.__hi").as("v_last") :+
        col("v_min") :+ col("v_max"): _*)

  def theilSen(series: DataFrame, keys: Seq[String], t: Column,
               v: Column): DataFrame = {
    val base = series.select(keys.map(col) :+ t.cast("long").as("__t") :+
      v.cast("long").as("__v"): _*)
    val l = base.select(keys.map(col) :+ col("__t").as("__t1") :+
      col("__v").as("__v1"): _*)
    val r = base.select(keys.map(col) :+ col("__t").as("__t2") :+
      col("__v").as("__v2"): _*)
    val pairs = l.join(r, keys).filter(col("__t1") < col("__t2"))
      .withColumn("__a", lit(1000000L) * (col("__v2") - col("__v1")))
      .withColumn("__dx", col("__t2") - col("__t1"))
      .withColumn("__slope",
        expr("(__a - pmod(__a, __dx)) div __dx"))
    val wr = Window.partitionBy(keys.map(col): _*).orderBy(col("__slope"))
    val wc = Window.partitionBy(keys.map(col): _*)
    val nPts = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_points"))
    pairs
      .withColumn("__rk", row_number().over(wr))
      .withColumn("__np", count(lit(1)).over(wc))
      .filter(col("__rk") === expr("(__np + 1) div 2"))
      .join(broadcast(nPts), keys)
      .select(keys.map(col) :+ col("n_points") :+
        col("__np").as("n_pairs") :+ col("__slope").as("slope_micro"): _*)
  }

  /**
   * MAD-based robust outliers — the modified z-score screen
   * (Iglewicz & Hoaglin 1993): flag rows where
   * `|0.6745 · (x − median) / MAD| > threshold`, with
   * `MAD = median(|x − median|)`. The robust sibling of the reference's
   * rolling mean/stddev signal (v_ae_early_signals.sql): mean/stddev
   * are themselves dragged by the outliers they are supposed to expose
   * (masking), while median/MAD have a 50% breakdown point — the
   * outlier screen that still works when the contamination is heavy.
   *
   * Shape: TWO grouped exact-percentile passes (median, then MAD over
   * the deviations) with the group-sized stats broadcast back between
   * them — the fact table is scanned twice and never shuffled. The
   * broadcasts are guarded by MEASURED cardinality (the targetEncodeLoo
   * pattern): the median frame is materialized once, counted, and only
   * broadcast-hinted under `maxBroadcastGroups` (~10 MB class at the
   * 640k default); above it both joins fall back to shuffled joins on
   * the keys — high-cardinality key sets never push an unbounded
   * driver broadcast. The
   * medians interpolate on exact integer cents (dyadic midpoints →
   * exact doubles, the q198 argument), so the modified z is a fixed
   * dag over identically-derived operands in both engines (round-6 on
   * the emitted score; membership decided on the raw value). Exact
   * `percentile` buffers per group — at 100 TB swap the two medians
   * for [[graft.operators.Sketch.quantilesApprox]]'s mergeable summary
   * (the documented scale lane; the screen is a heuristic, so the
   * ±n/accuracy rank error does not change its contract). Zero-MAD
   * groups (>50% of mass on one value) are excluded — no outlier is
   * decidable there, and ANSI mode would throw on the division.
   *
   * Emits the flagged rows: (keys…, id, v, med, mad, modified_z).
   */
  def robustOutliers(df: DataFrame, keys: Seq[String], id: Column,
                     value: Column, threshold: Double = 3.5,
                     maxBroadcastGroups: Long = 640000L): DataFrame = {
    require(threshold > 0.0, s"threshold must be > 0, got $threshold")
    val base = df.select(keys.map(col) :+ id.as("id") :+
      value.cast("long").as("v"): _*)
    // materialized so the guard count does not re-run the fact scan,
    // and counted ONCE — mad groups over the same keys, so one measured
    // cardinality decides both joins
    val med = base.groupBy(keys.map(col): _*)
      .agg(percentile(col("v"), lit(0.5)).as("med"))
      .localCheckpoint()
    val small = med.count() <= maxBroadcastGroups
    def side(f: DataFrame): DataFrame = if (small) broadcast(f) else f
    val dev = base.join(side(med), keys)
      .withColumn("__ad", abs(col("v").cast("double") - col("med")))
    val mad = dev.groupBy(keys.map(col): _*)
      .agg(percentile(col("__ad"), lit(0.5)).as("mad"))
    val mz = lit(0.6745) * (col("v").cast("double") - col("med")) / col("mad")
    dev.join(side(mad), keys)
      .filter(col("mad") > 0.0 && abs(mz) > threshold)
      .select(keys.map(col) :+ col("id") :+ col("v") :+ col("med") :+
        col("mad") :+ round(mz, 6).as("modified_z"): _*)
  }
}
