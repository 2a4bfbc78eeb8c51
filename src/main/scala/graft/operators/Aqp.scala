package graft.operators

import graft.functions.ShaLanes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate query processing over deterministic hash samples: answer
 * grouped COUNT/SUM aggregates from a p-rate sample with Horvitz-
 * Thompson scale-up and a standard-error column, instead of scanning
 * the full table — the 100 TB interactive-dashboard tier ([[Curate]]'s
 * hash sampling gives the sample; this gives the estimator and its
 * error bar).
 *
 * Sampling is the engine's reproducible Bernoulli: a row enters iff its
 * SHA lane on `tag` falls below `rate · 2^60` (same construction as the
 * q41 stratified sampler — deterministic, engine-independent, and
 * shuffle-free: the filter is scan-side, so the only exchange is the
 * grouped aggregate OVER THE SAMPLE).
 *
 * Estimators per group, with inclusion probability p = `rate`:
 *   n_est   = n_s / p                  (HT count)
 *   sum_est = sum_s / p               (HT sum)
 *   se_sum  = sqrt( Σ_s x² · (1−p)/p² ) (HT variance estimate, Bernoulli
 *             sampling: Var = Σ x²(1−p)/p², estimated over the sample)
 * A ~95% interval is sum_est ± 1.96·se_sum. With a dyadic `rate` (1/2,
 * 1/4, …) the scale-ups are exact doubles; the variance term sums
 * squared doubles and is rounded, so q111 hash-matches its DuckDB
 * mirror (the same two-decimal rounding that covers every double
 * aggregate in the gate).
 */
object Aqp {

  def sampledAggregate(df: DataFrame, keys: Seq[String], value: Column,
                       rate: Double, tag: Column): DataFrame = {
    require(rate > 0.0 && rate <= 1.0, s"rate in (0, 1], got $rate")
    val varFactor = (1.0 - rate) / (rate * rate)
    df.filter(ShaLanes.lane(tag).cast("double") < lit(rate * ShaLanes.LaneSpace))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_s"),
        sum(value).as("sum_s"),
        sum(pow(value.cast("double"), lit(2.0))).as("sum_sq"))
      .select((keys.map(col) :+
        col("n_s") :+
        (col("n_s") / lit(rate)).as("n_est") :+
        (col("sum_s") / lit(rate)).as("sum_est") :+
        round(sqrt(col("sum_sq") * lit(varFactor)), 2).as("se_sum")): _*)
  }
}
