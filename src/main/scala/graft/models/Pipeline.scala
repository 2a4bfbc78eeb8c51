package graft.models

import graft.checks.Checks
import graft.sources.MaudeIngest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * DAG runner for the vigilance models (reference `dbt run` semantics,
 * SURVEY.md §3 E1): builds the models in topological order —
 * seed → stg_maude → fact_adverse_events → ae_counts_q →
 * v_ae_early_signals — with the reference's per-layer materialization:
 * staging and the signals view stay lazy (temp views, dbt_project.yml:10-12)
 * while marts are persisted (dbt_project.yml:13-15).
 *
 * Each stage is tagged via the job group (the QUERY_TAG / FinOps analog,
 * README.md:128-133). Mart writes are partitioned by receive-year so
 * time-scoped reads prune at 100 TB.
 */
object Pipeline {

  final case class Models(
      stgMaude: DataFrame,
      factAdverseEvents: DataFrame,
      aeCountsQ: DataFrame,
      vAeEarlySignals: DataFrame)

  /** Build the full lazy DAG from a landing DataFrame + seed. */
  def build(maudeRaw: DataFrame, manufacturer: DataFrame): Models = {
    val stg    = StgMaude(maudeRaw)
    val fact   = FactAdverseEvents(stg, manufacturer)
    val counts = AeCountsQ(fact)
    val sig    = VAeEarlySignals(counts)
    Models(stg, fact, counts, sig)
  }

  /** Run end-to-end from paths; optionally persist marts under `martsDir`
    * (parquet, facts partitioned by receive-year). Registers every model
    * as a temp view (stg/view semantics) and returns the DAG. */
  def run(spark: SparkSession, landingPath: String, seedPath: String,
          martsDir: Option[String] = None): Models = {
    def tagged[T](tag: String)(body: => T): T = {
      spark.sparkContext.setJobGroup(tag, s"vigilance:$tag", interruptOnCancel = false)
      try body finally spark.sparkContext.clearJobGroup()
    }

    val models = build(
      MaudeIngest.batch(spark, landingPath),
      MaudeIngest.manufacturerSeed(spark, seedPath))

    models.stgMaude.createOrReplaceTempView("stg_maude")
    models.factAdverseEvents.createOrReplaceTempView("fact_adverse_events")
    models.aeCountsQ.createOrReplaceTempView("ae_counts_q")
    models.vAeEarlySignals.createOrReplaceTempView("v_ae_early_signals")

    martsDir.foreach { dir =>
      tagged("fact_adverse_events") {
        models.factAdverseEvents
          .withColumn("yyyy", year(col("date_received")))
          .write.mode("overwrite").partitionBy("yyyy")
          .parquet(s"$dir/fact_adverse_events")
      }
      tagged("ae_counts_q") {
        models.aeCountsQ.write.mode("overwrite").parquet(s"$dir/ae_counts_q")
      }
    }
    models
  }

  /** The reference's schema tests (`dbt test`, SURVEY.md §3 E3). */
  def checks(m: Models): Map[String, DataFrame] = Map(
    "stg_mdr_report_key_not_null" -> Checks.notNull(m.stgMaude, "mdr_report_key"),
    "stg_mdr_report_key_unique"   -> Checks.unique(m.stgMaude, "mdr_report_key"),
    "stg_report_number_not_null"  -> Checks.notNull(m.stgMaude, "report_number"),
    "stg_event_type_accepted"     -> Checks.acceptedValues(m.stgMaude, "event_type",
      Seq("Injury", "Malfunction", "Death", "Other", "No Answer Provided")),
    "stg_narrative_conditional"   -> Checks.notNull(m.stgMaude, "narrative_text",
      col("narrative_len") > 0),
    "fact_event_id_not_null"      -> Checks.notNull(m.factAdverseEvents, "event_id"),
    "fact_event_id_unique"        -> Checks.unique(m.factAdverseEvents, "event_id"),
    // The reference declares this even though the fact model never filters
    // NULL dates (models/marts/schema.yml:9-10; SURVEY.md §3 note) — it
    // fails whenever the data has date gaps, by design.
    "fact_date_received_not_null" -> Checks.notNull(m.factAdverseEvents, "date_received"),
    "fact_narrative_conditional"  -> Checks.notNull(m.factAdverseEvents, "narrative_text",
      col("narrative_len") > 0))
}
