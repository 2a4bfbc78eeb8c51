package graft.operators

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Generic rolling z-score anomaly detection ("early signals") — the
 * reference's flagship analytic (v_ae_early_signals.sql:5-47) lifted into a
 * reusable operator over any (entity keys × time) stream:
 *
 *  1. bucket rows into quarters and count them per key group,
 *  2. per key group ordered by quarter, compare each quarter's count to the
 *     trailing-4-quarter mean/stddev (`ROWS BETWEEN 4 PRECEDING AND 1
 *     PRECEDING` — the current row is excluded),
 *  3. z-score with the reference's guard: NULL when the trailing frame has
 *     <2 rows (sample stddev undefined) or zero variance.
 *
 * Scale notes: the groupBy and the window share the same key columns, so
 * Catalyst reuses one hash-partitioning exchange for both; cardinality
 * after step 1 is |keys|×|quarters| (tiny relative to input), so the
 * window stage never sees raw-event volume.
 */
object EarlySignals {

  /** Quarterly counts per key: keys..., yyyy, q, quarter_index,
    * year_quarter, n_events. NULL timestamps are filtered (ae_counts_q.sql:10). */
  def quarterlyCounts(df: DataFrame, keys: Seq[Column], timeCol: Column): DataFrame = {
    val named = keys
    df.filter(timeCol.isNotNull)
      .groupBy(
        (named :+
          year(timeCol).cast("long").as("yyyy") :+
          quarter(timeCol).cast("long").as("q") :+
          F.quarterIndex(timeCol).as("quarter_index") :+
          F.yearQuarterLabel(timeCol).as("year_quarter")): _*)
      .agg(count(lit(1)).as("n_events"))
  }

  /** Adds rn / mean_4 / std_4 / z_score over quarterly counts produced by
    * [[quarterlyCounts]] (or any frame with `quarter_index` + `n_events`). */
  def signals(quarterly: DataFrame, keyNames: Seq[String]): DataFrame = {
    val byKey = Window.partitionBy(keyNames.map(col): _*).orderBy(col("quarter_index"))
    val frame = byKey.rowsBetween(-4, -1)
    quarterly
      .withColumn("rn", row_number().over(byKey).cast("long"))
      .withColumn("mean_4", avg(col("n_events")).over(frame))
      .withColumn("std_4", stddev_samp(col("n_events")).over(frame))
      .withColumn("z_score", F.zScore(col("n_events"), col("mean_4"), col("std_4")))
  }

  /** Full pipeline: raw rows → quarterly counts → rolling z-scores. */
  def apply(df: DataFrame, keys: Seq[Column], keyNames: Seq[String], timeCol: Column): DataFrame =
    signals(quarterlyCounts(df, keys, timeCol), keyNames)

  /**
   * Disproportionality signal detection — the 2×2 contingency statistics
   * pharmacovigilance runs over (entity × reaction) report pairs (PRR,
   * ROR, chi², the Evans screen), generalizing the reference's
   * counts→signals tier (ae_counts_q.sql → v_ae_early_signals.sql) from
   * trend anomalies to association strength. For each (entity e, event v)
   * with cell counts a=|e∧v|, b=|e∧¬v|, c=|¬e∧v|, d=|¬e∧¬v|:
   *
   *   PRR  = (a/(a+b)) / (c/(c+d))        — proportional reporting ratio
   *   ROR  = (a·d)/(b·c)                  — reporting odds ratio
   *   χ²   = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))
   *   se   = sqrt(1/a+1/b+1/c+1/d)        — ln(ROR) std error (95% CI =
   *                                         exp(ln ROR ± 1.96·se))
   *   signal ⇔ PRR ≥ 2 ∧ χ² ≥ 4 ∧ a ≥ 3   — the Evans 2001 criteria
   *
   * The 95% CI bounds are deliberately NOT materialized: se is exposed and
   * sqrt is IEEE-correctly-rounded everywhere, while exp/ln may differ in
   * the last ulp across engines — callers exponentiate at the edge.
   *
   * Scale shape: ONE count shuffle over the report-grain input produces
   * the (entity, event) cell table; both margins and the grand total are
   * re-aggregations OF THAT CELL TABLE (cardinality |entities|×|events|,
   * micro vs report volume), so Catalyst's ReuseExchange serves all three
   * from the same shuffle files — the 100 TB fact is scanned and shuffled
   * exactly once, and every join above it is a broadcast of a margin
   * table. Cells with a < minCount are screened AFTER margins are taken
   * (margins must count every report) — the standard minimum-case filter
   * that also keeps 1/b·1/c finite in practice; b=0 or c=0 (entity or
   * event fully concentrated in the cell) yields NULL prr/ror/se rather
   * than ±Inf.
   */
  def disproportionality(reports: DataFrame, entityCol: String,
                         eventCol: String, minCount: Long = 3L): DataFrame = {
    val cells = reports
      .filter(col(entityCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(entityCol), col(eventCol))
      .agg(count(lit(1)).as("a"))
    val entityTot = cells.groupBy(col(entityCol)).agg(sum(col("a")).as("n_entity"))
    val eventTot = cells.groupBy(col(eventCol)).agg(sum(col("a")).as("n_event"))
    val grand = cells.agg(sum(col("a")).as("n_total"))
    val d2 = (col("n_total") - col("n_entity") - col("n_event") + col("a"))
    val b = (col("n_entity") - col("a")).cast("double")
    val c = (col("n_event") - col("a")).cast("double")
    val aD = col("a").cast("double")
    val dD = d2.cast("double")
    val nD = col("n_total").cast("double")
    val chiNum = aD * dD - b * c
    cells
      .join(broadcast(entityTot), entityCol)
      .join(broadcast(eventTot), eventCol)
      .crossJoin(broadcast(grand))
      .filter(col("a") >= minCount)
      .select(col(entityCol), col(eventCol), col("a").as("n_reports"),
        col("n_entity"), col("n_event"), col("n_total"),
        round(col("n_entity").cast("double") * col("n_event") / nD, 4)
          .as("expected"),
        round(when(c > 0, (aD / col("n_entity")) / (c / (nD - col("n_entity")))), 4)
          .as("prr"),
        round(when(b > 0 && c > 0, aD * dD / (b * c)), 4).as("ror"),
        round(when(b > 0 && c > 0,
          sqrt(lit(1.0) / aD + lit(1.0) / b + lit(1.0) / c + lit(1.0) / dD)), 4)
          .as("se_log_ror"),
        round(nD * chiNum * chiNum /
          (col("n_entity").cast("double") * (nD - col("n_entity")) *
            col("n_event") * (nD - col("n_event"))), 4).as("chi2"),
        (when(c > 0, (aD / col("n_entity")) / (c / (nD - col("n_entity"))))
          .otherwise(lit(Double.PositiveInfinity)) >= 2.0 &&
          nD * chiNum * chiNum /
            (col("n_entity").cast("double") * (nD - col("n_entity")) *
              col("n_event") * (nD - col("n_event"))) >= 4.0)
          .as("is_signal"))
  }
}
