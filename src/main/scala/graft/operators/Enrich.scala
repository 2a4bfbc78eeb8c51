package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * AI enrichment surface (reference README.md:59,70-71,115: AISQL
 * topic / severity / summary over narratives, run in 10-20k batches).
 *
 * The scorer is pluggable: [[Enricher]] is the model boundary, and
 * [[HeuristicEnricher]] is the deterministic, dependency-free default
 * (keyword taxonomy + guarded truncation) so the pipeline is testable and
 * reproducible without a model in the container. A real model plugs in as
 * another [[Enricher]] (e.g. batched mapPartitions over a local model)
 * without touching callers.
 */
trait Enricher {
  def topic(narrative: Column): Column
  def severity(narrative: Column): Column
  def summary(narrative: Column): Column

  final def apply(df: DataFrame, narrativeCol: String): DataFrame = {
    val n = col(narrativeCol)
    df.withColumn("topic", topic(n))
      .withColumn("severity", severity(n))
      .withColumn("summary", summary(n))
  }
}

/** Deterministic keyword-based enrichment (the pre-AISQL heuristic tier —
  * same spirit as the reference's interim failure-mode CASE,
  * fact_adverse_events.sql:76-86). */
object HeuristicEnricher extends Enricher {

  override def topic(n: Column): Column =
    when(n.ilike("%BATTERY%") || n.ilike("%POWER%"), lit("power_system"))
      .when(n.ilike("%SOFTWARE%") || n.ilike("%ERROR CODE%"), lit("software"))
      .when(n.ilike("%LEAD%") || n.ilike("%WIRE%"), lit("leads_wiring"))
      .when(n.ilike("%PUMP%") || n.ilike("%OCCLU%"), lit("infusion"))
      .otherwise(lit("general"))

  override def severity(n: Column): Column =
    when(n.ilike("%DEATH%") || n.ilike("%DIED%"), lit(3))
      .when(n.ilike("%INJUR%") || n.ilike("%HOSPITAL%"), lit(2))
      .when(n.isNotNull && length(n) > 0, lit(1))
      .otherwise(lit(0))

  override def summary(n: Column): Column =
    when(n.isNull || length(n) <= 200, n)
      .otherwise(concat(substring(n, 1, 200), lit("…")))
}
