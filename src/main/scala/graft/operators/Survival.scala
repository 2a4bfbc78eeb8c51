package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Kaplan–Meier survival estimation — the right-censoring-aware answer
 * to "how long until X" that a plain average of durations gets wrong
 * the moment some subjects haven't X-ed yet (churn, time-to-purchase,
 * device time-to-failure — the vigilance domain's own question). The
 * product-limit estimator:
 *
 *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)
 *
 * with dᵢ the events at time tᵢ and nᵢ the subjects still AT RISK
 * (duration ≥ tᵢ): censored subjects leave the risk set at their last
 * observation without counting as events — exactly the information a
 * mean discards.
 *
 * Shape: one grouped pass collapses subjects to per-time (events,
 * total) cells; the risk set is then `n_total − cumsum(earlier totals)`
 * — ONE ordered window per key over the TIME-GRID rows (never the
 * subjects), and the running product is `exp(Σ ln(1 − dᵢ/nᵢ))` over the
 * same window. Logs accumulate, so `survival` rides the round-6 lane
 * (the q161 discipline); d, n_risk stay exact Longs.
 *
 * Emits one row per (keys…, t) where at least one EVENT occurred — the
 * times where the curve steps: (keys…, t, d, n_risk, survival).
 */
object Survival {

  def kaplanMeier(subjects: DataFrame, keys: Seq[String], duration: Column,
                  event: Column): DataFrame = {
    val base = subjects.select(keys.map(col) :+
      duration.cast("long").as("t") :+ event.cast("long").as("__e"): _*)
    val cells = base.groupBy(keys.map(col) :+ col("t"): _*)
      .agg(sum(col("__e")).as("d"), count(lit(1)).as("__c"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    val wPrior = Window.partitionBy(keys.map(col): _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpTo = Window.partitionBy(keys.map(col): _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("n_risk",
        sum(col("__c")).over(wAll) -
          coalesce(sum(col("__c")).over(wPrior), lit(0L)))
      // a step where the WHOLE risk set events has factor 0 — ln(0) is
      // engine-divergent (NULL in Spark, -inf elsewhere), so that step
      // is kept out of the log sum (SUM skips NULLs identically in any
      // engine) and the curve is pinned to exactly 0 from it onward
      .withColumn("__f",
        when(col("d") < col("n_risk"),
          lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
      .withColumn("survival",
        round(when(max((col("d") === col("n_risk")).cast("long")).over(wUpTo)
          === 1L, lit(0.0))
          .otherwise(exp(coalesce(sum(log(col("__f"))).over(wUpTo),
            lit(0.0)))), 6))
      .filter(col("d") > 0L)
      .select(keys.map(col) :+ col("t") :+ col("d") :+ col("n_risk") :+
        col("survival"): _*)
  }
}
