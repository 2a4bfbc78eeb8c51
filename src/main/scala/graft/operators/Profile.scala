package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One-pass column profiling — the ANALYZE TABLE / data-quality tier
 * (reference README.md:57 "testami i kontraktami" generalized: the
 * contract checks in [[graft.checks.Checks]] assert specific rules; the
 * profiler measures the table so rules can be chosen). For every
 * requested column in ONE aggregate pass over ONE scan: row count, null
 * count, distinct count, and min/max rendered as strings (computed on
 * the native type FIRST — lexicographic min/max of stringified numbers
 * would be wrong — then cast for a uniform schema).
 *
 * Plan shape: a single global aggregate (map-side partials) producing one
 * wide row, exploded driver-light into one row per column (the explode
 * input is exactly 1 row). [[profile]] counts distincts exactly — Spark
 * plans the multi-column distinct via its Expand rewrite, which
 * multiplies scanned rows by the number of distinct-counted columns:
 * fine at mart scale, and the DuckDB-oracle-able form. [[profileApprox]]
 * is the 100 TB path: HLL partials (`approx_count_distinct`), no Expand,
 * fixed-size aggregation state per column regardless of cardinality.
 */
object Profile {

  private def profiled(df: DataFrame, cols: Seq[String],
                       nd: String => Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"$c#nn"),
      nd(c).as(s"$c#nd"),
      min(col(c)).cast("string").as(s"$c#min"),
      max(col(c)).cast("string").as(s"$c#max"))) :+ count(lit(1)).as("#n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col("`#n`").as("n"),
      (col("`#n`") - col(s"`$c#nn`")).as("n_null"),
      col(s"`$c#nd`").as("n_distinct"),
      col(s"`$c#min`").as("min_v"),
      col(s"`$c#max`").as("max_v"))): _*)
    row.select(explode(entries).as("p")).select("p.*")
  }

  /** Exact distinct counts (multi-distinct Expand plan — the oracle-able
    * form; q120). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profiled(df, cols, c => countDistinct(col(c)))

  /** HLL distinct counts (no Expand, O(1) state per column — the scale
    * path; cross-checked against [[profile]] in ProfileSpec). */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.05): DataFrame =
    profiled(df, cols, c => approx_count_distinct(col(c), rsd))
}
