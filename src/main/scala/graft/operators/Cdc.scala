package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Changelog folding: the lakehouse MERGE INTO / dbt-snapshot tier that
 * sits between [[Diff.snapshotDiff]] (what changed) and the marts
 * (current state). Two shapes:
 *
 *  - [[merge]] — SCD-1: fold a CDC changelog (or prior state ∪ delta)
 *    into current state, latest change per key wins, delete-marked keys
 *    drop out;
 *  - [[scd2History]] — SCD-2: turn the same changelog into validity
 *    intervals (valid_from / valid_to / is_current), collapsing
 *    consecutive rows whose tracked state did not change.
 *
 * Both are single-key-shuffle plans: merge is [[Curate.keepLatest]]'s
 * rank-1 window (compiles to WindowGroupLimit — per-partition top-1
 * pre-pruning map-side, so only one surviving row per key per input
 * partition enters the shuffle), and scd2History's change-detect and
 * interval windows share one partitioning+sort (the plan carries a
 * single Exchange). Nothing is ever joined and no payload moves twice —
 * the shape that makes a 100 TB nightly merge one shuffle of the delta,
 * not a rebuild.
 */
object Cdc {

  /**
   * SCD-1 CDC merge: latest row per key under `order` (pass descending
   * columns, ties broken by a unique column) wins; keys whose winning
   * row carries `deleteOp` in `opCol` are dropped (tombstones). The
   * output keeps the changelog schema — including `opCol` and the
   * ordering columns — so a materialized state can be re-entered as the
   * base of the next incremental merge:
   * `merge(state ∪ delta) == merge(wholeLog)` whenever every delta row
   * orders after every state row (CdcSpec pins the property).
   */
  def merge(log: DataFrame, keys: Seq[String], order: Seq[Column],
            opCol: String, deleteOp: String): DataFrame =
    Curate.keepLatest(log, keys, order)
      .filter(col(opCol) =!= lit(deleteOp))

  /**
   * SCD-2 history build: per key, order the changelog by `order`
   * (ascending, ties broken by a unique column) and emit one row per
   * run of equal `stateCol` values — `valid_from` = the run's first
   * `versionCol` value, `valid_to` = the next run's (NULL on the open
   * run), `version` = 1-based run index, `is_current` = open run.
   * Change detection is null-safe (a NULL state is a state).
   *
   * Plan: both windows (lag/row_number, then lead/row_number) use the
   * same partitioning and sort, and the collapse filter preserves both
   * — one Exchange, one Sort, two stacked WindowExecs (PlanSpec).
   */
  def scd2History(log: DataFrame, keys: Seq[String], stateCol: String,
                  order: Seq[Column], versionCol: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    log
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(stateCol)))
      .withColumn("valid_from", versionCol)
      .withColumn("valid_to", lead(versionCol, 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev", "__rn")
  }
}
