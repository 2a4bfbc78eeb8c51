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

  def ewma(df: DataFrame, keys: Seq[String], order: Column, value: Column,
           window: Int = 8): DataFrame = {
    require(window >= 1 && window <= 53, "window in [1, 53] (exactness bound)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
      .rowsBetween(-(window - 1), Window.currentRow)
    // frame order is oldest→newest; reverse so index k is the lag
    val arr = reverse(collect_list(value.cast("double")).over(w))
    val num = aggregate(
      transform(arr, (x, k) => x * pow(lit(2.0), -k)),
      lit(0.0), (acc, v) => acc + v)
    val den = lit(2.0) - pow(lit(2.0), -(size(arr) - lit(1)).cast("double"))
    df.withColumn("ewma", round(num / den, 4))
  }
}
