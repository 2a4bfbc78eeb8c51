package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Marketing-style conversion attribution over an event stream: each
 * CONVERSION event distributes credit across the same user's preceding
 * TOUCHPOINT events inside a lookback window, under the three standard
 * models at once —
 *
 *  - `first_touch`: the earliest touch in the window gets credit 1;
 *  - `last_touch`:  the latest touch gets credit 1;
 *  - `linear`:      every touch gets 1/n.
 *
 * This is the credit-assignment sibling of [[Funnel]] (which asks "did
 * the sequence complete"; attribution asks "who gets paid for it") and
 * of q122's transition matrix (unconditioned successor frequencies).
 *
 * Emits ONE ROW PER (conversion, touch, model) with its exact credit —
 * deliberately unaggregated: first/last credits are integers and the
 * linear credit is a SINGLE correctly-rounded division 1/n, so the
 * per-pair table is bit-reproducible in any engine with no rounding
 * lane; the caller's roll-up (credit per channel) is one grouped sum
 * away and carries the usual rounded-aggregate lane. Window position
 * ties are broken by the touch's id column, so "first"/"last" are
 * well-defined even on equal timestamps.
 *
 * Plan shape: one user-keyed equi-join between conversions and touches
 * (the interval predicate rides as a post-join filter — the q124
 * point-in-time shape; per-user event counts bound the fan-out), then
 * ONE conversion-keyed window pass computing rank, reverse rank and
 * count together. At 100 TB both legs shuffle once on the user key —
 * or the touch leg alone when events are bucket-published.
 */
object Attribution {

  /**
   * @param events     the stream
   * @param userCol    partitioning identity
   * @param tsCol      event time (any orderable type; the lookback is
   *                   compared on `tsCol` values via `lookback`)
   * @param idCol      unique event id (tie-break + conversion identity)
   * @param isConversion marks conversion rows
   * @param isTouch    marks touchpoint rows
   * @param channelCol the dimension credit is later rolled up by
   * @param lookback   max `tsCol` distance (exclusive start: a touch
   *                   qualifies iff conv.ts − lookback < touch.ts ≤ conv.ts,
   *                   and touch.id ≠ conv.id)
   */
  def credits(events: DataFrame, userCol: Column, tsCol: Column, idCol: Column,
              isConversion: Column, isTouch: Column, channelCol: Column,
              lookback: Column): DataFrame = {
    val conv = events.filter(isConversion).select(userCol.as("__u"),
      tsCol.as("__cts"), idCol.as("__cid"))
    val touch = events.filter(isTouch).select(userCol.as("__u"),
      tsCol.as("__tts"), idCol.as("__tid"), channelCol.as("channel"))
    val joined = conv.join(touch, Seq("__u"))
      .filter(col("__tts") <= col("__cts") &&
        col("__tts") > col("__cts") - lookback &&
        col("__tid") =!= col("__cid"))
    val w = Window.partitionBy(col("__cid"))
    val asc = w.orderBy(col("__tts").asc, col("__tid").asc)
    val desc = w.orderBy(col("__tts").desc, col("__tid").desc)
    val ranked = joined
      .withColumn("__rk_first", row_number().over(asc))
      .withColumn("__rk_last", row_number().over(desc))
      .withColumn("__n", count(lit(1)).over(w))
    def model(name: String, credit: Column) =
      ranked.select(col("__u").as("user_id"), col("__cid").as("conversion_id"),
        col("__tid").as("touch_id"), col("channel"), lit(name).as("model"),
        credit.as("credit"))
    model("first_touch",
        when(col("__rk_first") === 1, 1.0).otherwise(0.0))
      .unionAll(model("last_touch",
        when(col("__rk_last") === 1, 1.0).otherwise(0.0)))
      .unionAll(model("linear", lit(1.0) / col("__n").cast("double")))
  }
}
