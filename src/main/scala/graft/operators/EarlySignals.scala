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
}
