package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization of an event stream (batch form): events of one
 * user belong to the same session while consecutive gaps are ≤ `gapSeconds`.
 *
 * Classic lag → boundary-flag → running-sum pattern; both window passes use
 * the same (user) partitioning and ordering, so Catalyst plans exactly one
 * shuffle. Timestamps are truncated to whole seconds first so ordering and
 * gap arithmetic are integer-exact (and engine-agnostic for the oracle).
 *
 * The streaming-native equivalent is `session_window` in
 * [[graft.streaming.StreamSessionize]].
 */
object Sessionize {

  def apply(events: DataFrame, userCol: Column, tsCol: Column, idCol: Column,
            gapSeconds: Long): DataFrame = {
    val base = events.select(
      userCol.as("user_id"),
      unix_timestamp(date_trunc("second", tsCol)).as("ts_sec"),
      idCol.as("event_id"))
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val flagged = base
      .withColumn("prev_sec", lag(col("ts_sec"), 1).over(order))
      .withColumn("is_new",
        when(col("prev_sec").isNull ||
          col("ts_sec") - col("prev_sec") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts_sec")) - min(col("ts_sec"))).as("duration_sec"))
  }
}
