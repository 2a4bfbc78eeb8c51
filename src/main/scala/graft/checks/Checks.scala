package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * dbt-style data tests (reference models/stg/schema.yml,
 * models/marts/schema.yml, README.md:110): each check returns a DataFrame
 * of FAILING rows — empty means pass — mirroring dbt's
 * compiled-SELECT-of-failures contract so checks compose with any runner.
 */
object Checks {

  /** `not_null`, optionally scoped by a `where` predicate (the reference's
    * conditional narrative_text test, models/stg/schema.yml:30-32). */
  def notNull(df: DataFrame, column: String, where: Column = lit(true)): DataFrame =
    df.filter(where).filter(col(column).isNull)

  /** `unique`: key values occurring more than once. */
  def unique(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** `accepted_values`. NULLs fail (dbt semantics: use not_null separately
    * only if NULLs should also fail — dbt's accepted_values fails NULL-free;
    * we match dbt: NULLs pass). */
  def acceptedValues(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    df.filter(col(column).isNotNull && !col(column).isin(values: _*))

  /** `relationships`: child keys missing from the parent (left anti-join
    * must be empty — README.md:110 FK semantics). NULL FKs pass (dbt). */
  def relationships(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")

  /** Run a named suite; returns (name → failure count), all-zero = green. */
  def run(suite: Map[String, DataFrame]): Map[String, Long] =
    suite.map { case (name, failures) => name -> failures.count() }
}
