package graft.models

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Quarterly adverse-event counts per manufacturer × failure mode —
 * ae_counts_q.sql: '(unknown)' defaults (ae_counts_q.sql:6-7), NULL-date
 * filter (:10 — deliberately re-filtered here and NOT in the fact, see
 * SURVEY.md §3 note), year/quarter/quarter_index/label derivations
 * (:16-19), COUNT(*) grouped by all six (:20-22).
 */
object AeCountsQ {

  def apply(factAdverseEvents: DataFrame): DataFrame =
    factAdverseEvents
      .filter(col("date_received").isNotNull)
      .select(
        coalesce(col("canonical_mfr"), lit("(unknown)")).as("canonical_mfr"),
        coalesce(col("failure_mode"), lit("(unknown)")).as("failure_mode"),
        col("date_received"))
      .groupBy(
        col("canonical_mfr"),
        col("failure_mode"),
        year(col("date_received")).as("yyyy"),
        quarter(col("date_received")).as("q"),
        F.quarterIndex(col("date_received")).as("quarter_index"),
        F.yearQuarterLabel(col("date_received")).as("year_quarter"))
      .agg(count(lit(1)).as("n_events"))
}
