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
 * [[sharded]] is the scale form: a two-phase prefix sum. The ordering key
 * space is cut into `nShards` contiguous ranges; phase 1 computes each
 * shard's running sum under a PARTITIONED window (parallel across shards)
 * plus per-shard token totals (one tiny aggregate); phase 2 turns the ≤
 * nShards totals into cross-shard offsets on the driver (same size class
 * as a broadcast threshold or a centroid set) and broadcast-joins them
 * back. offset + within-shard running sum ≡ the global running sum, so
 * the result is bit-equal to [[sequential]] — which is retained as the
 * single-window executable spec (its partition-less window is the price
 * of a global order; only cross-engine verification pays it).
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

  /** Two-phase sharded packing, bit-equal to [[sequential]] (no shard arg);
    * `orderCol` must be a non-negative integral key. Runs two tiny driver
    * jobs at plan-construction time (max key, ≤nShards shard totals). */
  def sharded(df: DataFrame, orderCol: Column, nTokens: Column,
              budget: Long, nShards: Int = 32): DataFrame = {
    val key = orderCol.cast("long")
    // one pass computes the shard width AND validates the key contract —
    // a NULL/negative key would otherwise surface as an opaque NPE (null
    // shard total) or silently drop rows at the offsets join
    val maxRow = df.agg(max(key).as("mx"),
      count(when(key.isNull || key < 0, 1)).as("bad")).head()
    require(maxRow.getLong(1) == 0L,
      s"Pack.sharded requires a non-NULL, non-negative integral order key; " +
        s"${maxRow.getLong(1)} row(s) violate this (use Pack.sequential or clean the key)")
    val width =
      if (maxRow.isNullAt(0)) 1L
      else math.max(1L, maxRow.getLong(0) / nShards + 1)
    // integer shard id: contiguous ranges of the ordering key, so
    // (shard, orderCol) order == global orderCol order
    val shard = call_function("div", key, lit(width))
    val base = df.withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("pack_shard", shard)
    val w = Window.partitionBy(col("pack_shard")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = coalesce(sum(col("n_tokens")).over(w), lit(0L))
    val totals = base.groupBy(col("pack_shard"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _))
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("pack_shard", "pack_offset"))
    base.join(offDf, Seq("pack_shard"))
      .withColumn("chunk_id",
        floor((col("pack_offset") + within) / lit(budget.toDouble)).cast("long"))
      .drop("pack_shard", "pack_offset")
  }

  /**
   * Per-document token-window chunking — the other packing style: instead
   * of concatenating documents ([[sequential]]/[[sharded]]), each document
   * is cut into fixed-size token windows with overlap (`stride` <
   * `chunkSize` keeps `chunkSize - stride` tokens of left context per
   * window — the standard long-document treatment for context-bounded
   * training and embedding).
   *
   * One row per (doc, window): `(doc, chunk_id, n_tokens, chunk_text)`.
   * Windows start at `chunk_id * stride`; the last window starts at the
   * largest multiple of `stride` still inside the token list, so every
   * token lands in ≥ 1 window and no window starts past the end. A doc
   * with ≤ `chunkSize` tokens yields exactly one window. NULL-text docs
   * yield no rows (nothing to chunk).
   *
   * Scale shape: tokenize → `sequence`/`posexplode` → `slice`, all
   * scan-side (one Generate, ZERO shuffle, no UDF); output order is
   * irrelevant downstream so no sort is imposed.
   */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toks = graft.functions.Text.tokens(col(textCol))
    // windows = ceil((n - chunkSize) / stride) + 1 for n > chunkSize
    // (stride <= chunkSize guarantees the last start is < n), else 1
    val nWin = when(size(toks) <= chunkSize, lit(1))
      .otherwise(
        ceil((size(toks) - lit(chunkSize)) / lit(stride.toDouble)).cast("int") + lit(1))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc"), toks.as("toks"),
        posexplode(sequence(lit(0), nWin - lit(1))).as(Seq("chunk_id", "w")))
      .select(col("doc"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("chunk_id") * stride + lit(1), lit(chunkSize)).as("win"))
      .select(col("doc"), col("chunk_id"),
        size(col("win")).cast("long").as("n_tokens"),
        concat_ws(" ", col("win")).as("chunk_text"))
  }
}
