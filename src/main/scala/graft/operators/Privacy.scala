package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Governance-tier re-identification audits (the reference's governance
 * pillar, README.md:127-133, states access control and lineage as
 * prose; group-size auditing is the engine-side primitive beneath
 * "is this slice safe to expose"): k-anonymity flags quasi-identifier
 * combinations matching fewer than k rows (an attacker joining on the
 * QI pins those rows down), l-diversity flags groups whose sensitive
 * attribute takes fewer than l distinct values (group membership alone
 * leaks the sensitive value even when k holds).
 *
 * One grouped pass: `count(*)` + `count(distinct sensitive)` per QI
 * combination — a single shuffle on the QI key, no joins, output
 * bounded by the QI-combination count. At 100 TB the QI cardinality,
 * not the row count, bounds the state (same argument as any grouped
 * aggregate); `approx_count_distinct` or the KMV/HLL sketches swap in
 * when the sensitive column's per-group distinct state matters.
 *
 * [[generalize]] is the standard remediation step: band a numeric
 * column to width-`w` buckets (floor division, integer-exact), coarse
 * enough bands turning failing QI groups into passing ones.
 */
object Privacy {

  /** Per-QI-group audit: `n` (group size), `l` (distinct sensitive
    * values), and the two risk flags. `k`/`l` thresholds follow the
    * usual convention: a group PASSES when n >= k and l >= minL. */
  def kAnonymityAudit(df: DataFrame, qi: Seq[String], sensitive: Column,
                      k: Int, minL: Int = 2): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(sensitive).as("l"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("l") >= minL)

  /** Band `v` to width-`w` buckets: `floor(v / w) * w` (integer-exact
    * generalization for ages, timestamps, amounts; `pmod` keeps the
    * floor semantics for negative values too). */
  def generalize(v: Column, w: Long): Column = {
    require(w >= 1, "band width >= 1")
    v.cast("long") - pmod(v.cast("long"), lit(w))
  }
}
