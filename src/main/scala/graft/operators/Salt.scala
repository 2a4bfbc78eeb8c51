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
}
