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
}
