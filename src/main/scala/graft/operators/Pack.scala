package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for training-data pipelines: assign documents, in a
 * deterministic order, to fixed-token-budget chunks (the concat-then-chunk
 * step that turns a deduped corpus into training sequences).
 *
 * Chunk id = floor(tokens-before-this-doc / budget) under a running sum in
 * `orderCol` order — documents may straddle a boundary, exactly like the
 * usual concatenate-and-slice packing.
 *
 * Scale note: packing is inherently sequential within an ordering, so at
 * corpus scale you pack per shard — pass `shardCol` and each shard gets
 * its own running sum (one window partition per shard, parallel across
 * shards). The unsharded form (global order) exists for small corpora and
 * cross-engine verification; its single-partition window is the price of
 * a global order.
 */
object Pack {

  def sequential(df: DataFrame, orderCol: Column, nTokens: Column,
                 budget: Long, shardCol: Option[Column] = None): DataFrame = {
    val w0 = shardCol.fold(Window.orderBy(orderCol))(s => Window.partitionBy(s).orderBy(orderCol))
    val w = w0.rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = coalesce(sum(nTokens).over(w), lit(0L))
    df.withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("chunk_id", floor(cumBefore / lit(budget.toDouble)).cast("long"))
  }
}
