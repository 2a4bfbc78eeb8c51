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

  /**
   * Cohen's kappa — chance-corrected agreement between two categorical
   * raters (Cohen 1960): the label-quality primitive of a training-data
   * pipeline ("do the auto-labeler and the declared label actually
   * agree beyond chance?"):
   *
   *   κ = (p_o − p_e) / (1 − p_e),  p_o = Σ diag / n,
   *   p_e = Σ_k (rowTot_k · colTot_k) / n²
   *
   * One (a, b) cell aggregate; both marginals are LABEL-sized, so their
   * label-matched join (the p_e product sum) broadcasts; nothing
   * fact-sized survives the first pass. Counts exact Longs; the p_e
   * product sum rides doubles (a Long product overflows once a label
   * holds ~3e9 rows on both margins) → round-6 lane, and κ is computed
   * FROM the rounded p_o/p_e (the q179 derived-from-rounded
   * discipline). Two constant raters make p_e = 1 and κ undefined →
   * NULL, the file-family convention.
   *
   * Emits one row: (n, n_agree, po, pe, kappa).
   */
  def cohensKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.filter(a.isNotNull && b.isNotNull)
      .groupBy(a.cast("string").as("__a"), b.cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    val at = cells.groupBy(col("__a")).agg(sum(col("__n")).as("__at"))
    val bt = cells.groupBy(col("__b")).agg(sum(col("__n")).as("__bt"))
    val tot = cells.agg(sum(col("__n")).as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__n"))), lit(0L))
        .as("n_agree"))
    val peNum = at.join(broadcast(bt), col("__a") === col("__b"))
      .agg(coalesce(sum(col("__at").cast("double") *
        col("__bt").cast("double")), lit(0.0)).as("__pe_num"))
    val nD = col("n").cast("double")
    val po = round(col("n_agree").cast("double") / nD, 6)
    val pe = round(col("__pe_num") / (nD * nD), 6)
    tot.crossJoin(broadcast(peNum))
      .select(col("n"), col("n_agree"), po.as("po"), pe.as("pe"))
      .withColumn("kappa",
        when(col("pe") < 1.0,
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6)))
  }
}
