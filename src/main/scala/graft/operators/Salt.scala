package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Key-salting primitives for skewed shuffles (SURVEY.md §7 "salting only
 * if mfr×mode skew shows up" — the manual fallback when AQE's runtime
 * skew-join split isn't available, e.g. for aggregations or non-AQE
 * builds).
 *
 * Both operators trade one shuffle of a hot key for `buckets`-way
 * parallelism, at the cost of replicating the small side (join) or one
 * extra reduce stage (aggregation). Results are exactly equal to the
 * unsalted operator; salts are deterministic hashes, never RNG.
 */
object Salt {

  /**
   * Two-phase aggregation for skewed grouping keys: stage 1 aggregates
   * `(keys, salt)` partitions, stage 2 combines per `keys`. Use with
   * decomposable aggregates — each entry is (partial, combine) where
   * `partial` runs within a salt bucket and `combine` merges buckets
   * (e.g. `count(*)` then `sum`, `sum(x)` then `sum`, `max(x)` then `max`).
   *
   * `saltBy` determines the bucket: pass a fine-grained column (a unique
   * id, or the pre-aggregation row hash). Rows of one hot key spread
   * across `buckets` reducers instead of one.
   */
  def aggregate(df: DataFrame, keys: Seq[String], saltBy: Column, buckets: Int,
                partials: Seq[Column], combines: Seq[Column]): DataFrame = {
    require(partials.nonEmpty && partials.length == combines.length)
    val salted = df.withColumn("__salt", pmod(xxhash64(saltBy), lit(buckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combines.head, combines.tail: _*)
  }

  /**
   * Salted equi-join for a skewed key distribution where the right side is
   * too large to broadcast but small enough to replicate `buckets`×: the
   * left (skewed) side gets a deterministic salt from `saltBy`, the right
   * side is exploded across every salt value, and the join key becomes
   * `(keys..., salt)` — a hot key's rows now land on `buckets` reducers.
   *
   * Exactly equivalent to `left.join(right, keys, joinType)` for
   * `joinType` in (inner, left).
   */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           saltBy: Column, buckets: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType")
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(buckets)))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedLeft
      .join(explodedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /**
   * Skew diagnostics — the DECIDE half of the salting story
   * ([[aggregate]]/[[join]] are the remedies, AQE skew-join the runtime
   * fallback): per-key row counts summarized into the numbers that say
   * whether a shuffle keyed by `keys` will hot-spot. One output row per
   * top-`topK` heaviest key ((cnt desc, keys asc) — deterministic), each
   * carrying the global diagnostics: `n_rows`, `n_keys`,
   * `share` = cnt/n_rows (6dp), and `skew_ratio` = max_cnt·n_keys/n_rows
   * (the heaviest reducer's load relative to a perfectly uniform spread,
   * 4dp) — ratio ≈ 1 means salting buys nothing; ratio ≫ 1 is the hot
   * key count [[join]]'s `buckets` should match.
   *
   * Plan shape: ONE count aggregate keyed by `keys` — deliberately the
   * SAME shuffle the diagnosed operation would run, so the report costs
   * what one pass of the real job costs; the count table is O(distinct
   * keys) and never returns to the driver. Globals are a single-row
   * re-aggregate broadcast back, and the top-K compiles to
   * TakeOrderedAndProject (per-partition top-N, no global sort, no
   * partition-less window). All ratios are exact integer arithmetic
   * widened to double at the final division.
   */
  def skewReport(df: DataFrame, keys: Seq[String], topK: Int = 10): DataFrame = {
    require(keys.nonEmpty && topK >= 1)
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
    val globals = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
    counts.crossJoin(broadcast(globals))
      .select((keys.map(col) :+ col("cnt") :+
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share") :+
        col("n_rows") :+ col("n_keys") :+
        round((col("max_cnt") * col("n_keys")).cast("double") / col("n_rows"), 4)
          .as("skew_ratio")): _*)
      .orderBy(col("cnt").desc +: keys.map(col(_).asc): _*)
      .limit(topK)
  }
}
