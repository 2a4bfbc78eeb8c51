package graft.models

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fact table — Spark re-expression of fact_adverse_events.sql:
 *
 *  - deterministic `event_id` = SHA2-256 over
 *    `report_number|mdr_report_key|date_received` with NULL→''
 *    (fact_adverse_events.sql:43-50) via [[F.surrogateKey]];
 *  - manufacturer canonicalization: LEFT join on
 *    `UPPER(TRIM(raw_name)) = UPPER(TRIM(COALESCE(manufacturer_name,
 *    manufacturer_g1_name, brand_name)))` (fact_adverse_events.sql:23-38,
 *    88-90); `canonical_mfr` falls back to the *plain* manufacturer_name,
 *    not the coalesced join key (fact_adverse_events.sql:58);
 *  - `year_quarter` label from date_received (fact_adverse_events.sql:70);
 *  - failure-mode ILIKE ladder (fact_adverse_events.sql:77-86), order
 *    significant, NULL when nothing matches.
 *
 * Scale: the seed dimension is ~4.8k rows — explicitly broadcast, so the
 * fact side never shuffles for this join.
 */
object FactAdverseEvents {

  def failureMode(narrative: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(narrative.ilike("%LEAK%"), lit("LEAK"))
      .when(narrative.ilike("%FRACTURE%"), lit("FRACTURE"))
      .when(narrative.ilike("%BREAK%"), lit("FRACTURE/BREAK"))
      .when(narrative.ilike("%THROMB%"), lit("THROMBUS/CLOT"))
      .when(narrative.ilike("%INFECTION%"), lit("INFECTION"))
      .when(narrative.ilike("%DISLODG%"), lit("DISLODGEMENT"))
      .when(narrative.ilike("%MIGRAT%"), lit("MIGRATION"))

  def apply(stgMaude: DataFrame, manufacturer: DataFrame): DataFrame = {
    val dim = manufacturer.select(
      upper(trim(col("raw_name"))).as("raw_name_u"),
      col("canonical_name"),
      col("manufacturer_id"))

    val s = stgMaude.withColumn("manufacturer_name_u",
      upper(trim(coalesce(
        col("manufacturer_name"), col("manufacturer_g1_name"), col("brand_name")))))

    s.join(broadcast(dim), col("raw_name_u") === col("manufacturer_name_u"), "left")
      .select(
        F.surrogateKey(col("report_number"), col("mdr_report_key"),
          col("date_received")).as("event_id"),
        col("report_number"),
        col("mdr_report_key"),
        col("manufacturer_id"),
        coalesce(col("canonical_name"), col("manufacturer_name")).as("canonical_mfr"),
        col("product_code"),
        col("device_name"),
        col("brand_name"),
        col("event_type"),
        col("product_problem"),
        col("event_date"),
        col("date_received"),
        F.yearQuarterLabel(col("date_received")).as("year_quarter"),
        col("narrative_text"),
        length(col("narrative_text")).as("narrative_len"),
        failureMode(col("narrative_text")).as("failure_mode"))
  }
}
