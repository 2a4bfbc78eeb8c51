package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Experiment readout: per-variant conversion with Wilson score
 * intervals — the A/B-test primitive every analytics engine ends up
 * owning (the reference's SLO culture — README.md:137-141's
 * recall/latency acceptance gates — applied to product experiments:
 * "is B actually better, or is the sample too small to say"). Wilson
 * over the naive Wald interval because it stays inside [0,1] and
 * behaves at small n / extreme rates — the standard recommendation
 * (Brown, Cai & DasGupta 2001, "Interval Estimation for a Binomial
 * Proportion").
 *
 * Aggregation contract: the experiment UNIT converts or not (a user
 * who fires five purchase events converted ONCE) — so the first pass
 * collapses events to units (`max(converted)` per unit, a 0/1 Long)
 * and the second counts exact unit/conversion integers per variant.
 * Two grouped passes, each shuffling only keys; nothing event-sized
 * survives the first.
 *
 * Determinism: n and x are exact Longs; every downstream value is a
 * fixed dag of correctly-rounded double ops (+ − × ÷ sqrt are all
 * IEEE-754 correctly rounded) on identically-derived operands, so the
 * result is bit-identical cross-engine as long as the oracle writes
 * the SAME expression shape — which the q184 oracle does. The rate is
 * raw (one division); the bounds are rounded to 6dp purely as a
 * readability lane, not a correctness one.
 *
 * Emits one row per variant: (variant, n_units, n_conv, rate,
 * wilson_lo, wilson_hi).
 */
object Experiment {

  def abTest(events: DataFrame, unit: Column, variant: Column,
             converted: Column, z: Double = 1.96): DataFrame = {
    require(z > 0.0, s"z must be > 0, got $z")
    val perUnit = events
      .select(unit.as("__u"), variant.as("variant"),
        converted.cast("long").as("__c"))
      .groupBy(col("__u"), col("variant"))
      .agg(max(col("__c")).as("__conv"))
    val counts = perUnit.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_units"), sum(col("__conv")).as("n_conv"))
    val n = col("n_units").cast("double")
    val p = col("n_conv").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = p + z2 / (lit(2.0) * n)
    val margin = lit(z) *
      sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))
    counts.select(col("variant"), col("n_units"), col("n_conv"),
      p.as("rate"),
      round((center - margin) / denom, 6).as("wilson_lo"),
      round((center + margin) / denom, 6).as("wilson_hi"))
  }
}
