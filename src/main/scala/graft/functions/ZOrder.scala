package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering for multi-dimensional file skipping — the
 * write-side layout operator a 100 TB lakehouse needs when queries filter
 * on TWO columns: a table range-partitioned and sorted by the interleaved
 * bit value keeps BOTH dimensions' per-file min/max ranges tight, so
 * parquet row-group/file statistics prune on either predicate (a single-
 * column sort gives tight stats on one dimension and useless stats on the
 * other). The reference delegates layout to Snowflake micro-partition
 * clustering; this is the Spark-native equivalent (SURVEY.md §4 calls the
 * mart layout decision ours to make).
 *
 * Everything here is pure built-in Column bit math — whole-stage
 * codegen'd, no UDF, no custom expression — and bit-reproducible in ANSI
 * SQL, so the z-value computation itself is a declared, DuckDB-oracled
 * query (q51).
 */
object ZOrder {

  /** (shift, mask) steps of the classic bit-spread: after all steps, bit
    * i of the masked input sits at position 2i. */
  private val Steps = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 31 bits of x to even bit positions 0,2,…,60. The
    * 31-bit cap keeps the interleaved value positive in signed-64 space
    * (bit 61 is the highest set bit), so ordering by the z value is the
    * same in any engine's signed BIGINT order. */
  private def spread(x: Column): Column =
    Steps.foldLeft(x.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (c, (s, m)) => (c bitwiseOR shiftleft(c, s)).bitwiseAND(lit(m))
    }

  /** 62-bit Morton value interleaving the low 31 bits of `a` (even bit
    * positions) and `b` (odd positions). Monotonic locality: rows close
    * in BOTH dimensions are close in z order. */
  def zvalue(a: Column, b: Column): Column =
    spread(a) bitwiseOR shiftleft(spread(b), 1)

  /**
   * Prepare a frame for a z-clustered write: range-partition into
   * `numPartitions` z-ranges (one sampling pass — the standard price of
   * any clustered write) and sort each partition by z, so every output
   * file covers a tight rectangle in (a, b) space and its parquet min/max
   * stats prune reads filtered on either column. Write the result with
   * any sink; the layout survives because projection preserves row order.
   */
  def cluster(df: DataFrame, a: Column, b: Column,
              numPartitions: Int): DataFrame =
    df.withColumn("__z", zvalue(a, b))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /**
   * Zone-map statistics over a z-bucketed layout — the table a
   * data-skipping reader consults: rows bucket by the TOP `bucketBits`
   * of their z-value (a z-range ≈ one file of a [[cluster]]ed write),
   * and each bucket reports row count plus per-dimension min/max of the
   * ORIGINAL values. Each dimension is range-normalized onto the full
   * 31-bit interleave domain first (`(v - min) * (2^31-1) div range`,
   * integer-exact in any engine) — raw bit interleaving is meaningless
   * when a dimension doesn't fill its domain (a user-id column topping
   * out at 2^11 leaves the top 20 z-bit pairs constant and every row in
   * ONE bucket; this is why production z-ordering range-normalizes or
   * ranks before interleaving). The bounds pass is one tiny aggregate
   * cross-joined back as a broadcast single row.
   *
   * A bucket fixes the top `bucketBits/2` bits of BOTH normalized
   * dimensions, so its rectangle is ≤ range/2^(bucketBits/2) wide on
   * each side — the bound stats-based pruning on either predicate rests
   * on (ZOrderSpec asserts it; q107 oracles the whole computation).
   * Overflow note: ANSI multiplication guards the normalization — it
   * requires per-dimension range < 2^32, loudly. The guard is asserted
   * HERE (not forced session-wide by `Graft.configure`): a session with
   * `spark.sql.ansi.enabled=false` is refused up front, because with
   * ANSI off the product would wrap silently into garbage buckets.
   *
   * Migration note (round 6): `bucketBits` tightened from any value in
   * [1,62] to EVEN values in [2,62] — the per-dimension rectangle bound
   * is unsound for odd widths. Callers holding layouts computed with odd
   * bits must recompute with the adjacent even width; the throw is
   * deliberate (no silent rounding) so a persisted-layout mismatch is
   * caught at call time rather than read time.
   */
  def zoneMap(df: DataFrame, a: Column, b: Column,
              bucketBits: Int = 10): DataFrame = {
    // even only: the per-dimension rectangle bound documented above
    // (bucketBits/2 bits fixed on BOTH dims) holds only when the bucket
    // prefix splits evenly across the two interleaved dimensions
    require(bucketBits >= 2 && bucketBits <= 62 && bucketBits % 2 == 0,
      "bucketBits even, in [2, 62]")
    require(df.sparkSession.conf.get("spark.sql.ansi.enabled", "true").toBoolean,
      "zoneMap requires spark.sql.ansi.enabled=true: its range " +
        "normalization relies on ANSI to fail loudly past a 2^32 " +
        "dimension range instead of wrapping silently (Graft.configure " +
        "scaladoc documents the contract)")
    val bounds = df.select(a.as("a"), b.as("b")).agg(
      min(col("a")).as("a_min"), max(col("a")).as("a_max"),
      min(col("b")).as("b_min"), max(col("b")).as("b_max"))
    def scaled(v: String, mn: String, mx: String): Column =
      expr(s"($v - $mn) * 2147483647 DIV greatest($mx - $mn, 1)")
    df.select(a.cast("long").as("a"), b.cast("long").as("b"))
      .crossJoin(broadcast(bounds))
      .withColumn("bucket", shiftrightunsigned(
        zvalue(scaled("a", "a_min", "a_max"), scaled("b", "b_min", "b_max")),
        62 - bucketBits))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
  }
}
