package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, attach the latest right row with the
 * same keys and `right.ts <= left.ts` (time-series point-in-time lookup —
 * an operator Spark lacks natively; the brief's canonical compose-first
 * custom operator).
 *
 * Realization is the merge-sorted composition, NOT a range join: tag both
 * sides, union, and take `last(right payload, ignoreNulls)` over a window
 * ordered by (ts, tag) with rights sorting before lefts on ties (so
 * `right.ts == left.ts` matches). One hash shuffle on the keys, linear
 * scan per partition — no O(|L|×|R|) candidate blowup, and skew follows
 * the key distribution exactly like any keyed window.
 *
 * `right` must be unique per (keys, ts) — pre-aggregate it otherwise
 * (the result would be pick-one-arbitrarily, which a deterministic engine
 * must not do silently).
 */
/**
 * Point-in-interval range join: pair every left point with the right
 * intervals (same keys) containing it — Spark-first via bucketization,
 * not a non-equi nested-loop join.
 *
 * Both sides map to fixed-width time bins: an interval covers
 * `floor(start/w) .. floor(end/w)` (one row per covered bin via
 * `sequence`+`explode`), a point lives in exactly one bin, and the join
 * becomes an equi-join on (keys, bin) plus the exact BETWEEN filter.
 * Candidate work per point is bounded by the intervals overlapping its
 * bin — O(selectivity), not O(|points| × |intervals|); `binWidth` trades
 * interval replication against candidate count (pick ~median interval
 * length).
 */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      ptCol: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val binned = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val p = points.withColumn("__bin", floor(col(ptCol) / binWidth).cast("long"))
    p.join(binned, keys :+ "__bin")
      .filter(col(ptCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }
}

object AsOf {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    require(rightPayload.nonEmpty, "right side needs at least one payload column")
    require(leftPayload.nonEmpty,
      "left side needs at least one payload column (struct() of none is invalid)")
    val clash = leftPayload.intersect(rightPayload)
    require(clash.isEmpty,
      s"payload column names must be disjoint (rename or prefix): ${clash.mkString(", ")}")

    val lRow = struct(leftPayload.map(col).toIndexedSeq: _*)
    val rRow = struct(rightPayload.map(col).toIndexedSeq: _*)
    val l = left.select(
      (keys.map(col) :+ col(tsCol) :+ lRow.as("__l") :+
        lit(null).cast(right.select(rRow).schema.head.dataType).as("__r") :+
        lit(1).as("__tag")): _*)
    val r = right.select(
      (keys.map(col) :+ col(tsCol) :+
        lit(null).cast(left.select(lRow).schema.head.dataType).as("__l") :+
        rRow.as("__r") :+ lit(0).as("__tag")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val outCols =
      keys.map(col) ++ Seq(col(tsCol)) ++
        leftPayload.map(c => col("__l").getField(c).as(c)) ++
        rightPayload.map(c => col("__m").getField(c).as(c))
    matched.select(outCols.toIndexedSeq: _*)
  }
}
