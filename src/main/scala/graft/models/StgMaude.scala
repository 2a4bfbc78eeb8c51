package graft.models

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Staging model — Spark re-expression of stg_maude.sql (all semantics, not
 * a translation):
 *
 *  - VARIANT path extraction + `::string` casts (stg_maude.sql:6-25) →
 *    struct field access on the schema-first `raw` column (missing → NULL);
 *  - `PARSE_YYYYMMDD` (stg_maude.sql:8-9) → [[F.parseYyyymmdd]] (NULL-safe);
 *  - event_type normalization CASE (stg_maude.sql:11-18);
 *  - `devices_agg` (stg_maude.sql:32-46): OUTER flatten of `raw.device` +
 *    per-report MAX over non-blank values — note the reference keeps the
 *    *untrimmed* original value, blanks only decide eligibility;
 *  - `text_flat` + `LISTAGG(text_piece,'\n') WITHIN GROUP (ORDER BY index)`
 *    (stg_maude.sql:49-56,72): posexplode_outer + sort-inside-aggregation,
 *    deterministic under shuffle; NULL pieces are skipped and an all-NULL
 *    group yields '' (Snowflake LISTAGG), so narrative_len is 0, not NULL;
 *  - final wide GROUP BY + LEFT JOIN USING(mdr_report_key)
 *    (stg_maude.sql:59-87).
 *
 * Scale: both aggregations and the join key on `mdr_report_key`, so
 * Catalyst's EnsureRequirements reuses a single hash exchange; per-report
 * device/text arrays are bounded (<100 elements), so no skew handling is
 * needed at the flatten stage.
 */
object StgMaude {

  private val NaValues = Seq("N/A", "NA", "UNKNOWN", "NOT AVAILABLE")

  def apply(maudeRaw: DataFrame): DataFrame = {
    val et  = col("raw.event_type")
    val etU = upper(trim(et))
    val base = maudeRaw.select(
      col("raw"),
      col("raw.mdr_report_key").as("mdr_report_key"),
      col("raw.report_number").as("report_number"),
      F.parseYyyymmdd(col("raw.date_received")).as("date_received"),
      F.parseYyyymmdd(col("raw.event_date")).as("event_date"),
      et.as("event_type_raw"),
      when(etU.isin("INJURY", "MALFUNCTION", "DEATH"), initcap(trim(et)))
        .when(et.isNull || trim(et) === "" || etU.isin(NaValues: _*),
          lit("No Answer Provided"))
        .otherwise(lit("Other"))
        .as("event_type"),
      col("raw.product_problem").as("product_problem"),
      col("raw.device_report_product_code").as("product_code"),
      col("raw.device_name").as("device_name_top"),
      col("raw.brand_name").as("brand_name_top"),
      col("raw.manufacturer_d_name").as("manufacturer_name_top"),
      col("raw.manufacturer_g1_name").as("manufacturer_g1_name_top"),
      col("src_filename"),
      col("load_ts"))

    val devicesAgg = base
      .select(col("mdr_report_key"),
        explode_outer(col("raw.device")).as("d"))
      .groupBy(col("mdr_report_key"))
      .agg(
        F.firstNonBlank(col("d.manufacturer_d_name")).as("manufacturer_name_dev"),
        F.firstNonBlank(col("d.manufacturer_g1_name")).as("manufacturer_g1_name_dev"),
        F.firstNonBlank(col("d.brand_name")).as("brand_name_dev"),
        F.firstNonBlank(col("d.device_name")).as("device_name_dev"))

    val textFlat = base
      .select((base.columns.map(col).toSeq :+
        posexplode_outer(col("raw.mdr_text"))): _*)
      .withColumn("text_piece", F.trimToNull(col("col.text")))
      .withColumnRenamed("pos", "idx")

    val narrative = F.orderedListagg(col("text_piece"), col("idx"), "\n")

    val grouped = textFlat
      .groupBy(
        col("mdr_report_key"), col("report_number"),
        col("date_received"), col("event_date"),
        col("event_type"), col("event_type_raw"),
        col("product_problem"), col("product_code"),
        col("device_name_top"), col("brand_name_top"),
        col("manufacturer_name_top"), col("manufacturer_g1_name_top"),
        col("src_filename"), col("load_ts"))
      .agg(narrative.as("narrative_text"))
      .withColumn("narrative_len", length(col("narrative_text")))

    grouped
      .join(devicesAgg, Seq("mdr_report_key"), "left")
      .select(
        col("mdr_report_key"),
        col("report_number"),
        col("date_received"),
        col("event_date"),
        col("event_type"),
        col("event_type_raw"),
        col("product_problem"),
        col("product_code"),
        coalesce(col("device_name_top"), col("device_name_dev")).as("device_name"),
        coalesce(col("brand_name_top"), col("brand_name_dev")).as("brand_name"),
        coalesce(col("manufacturer_name_top"), col("manufacturer_name_dev")).as("manufacturer_name"),
        coalesce(col("manufacturer_g1_name_top"), col("manufacturer_g1_name_dev")).as("manufacturer_g1_name"),
        col("narrative_text"),
        col("src_filename"),
        col("load_ts"),
        col("narrative_len"))
  }
}
