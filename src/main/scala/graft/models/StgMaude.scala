package graft.models

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame}
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
 * Scale: BOTH reference aggregations run over per-row arrays (a report's
 * own devices / narrative fragments), so [[apply]] computes them as
 * higher-order array functions inside the one landing scan — the
 * staging model is a single shuffle-free codegen'd projection: no
 * explode, no groupBy, no self-join, and the JSON parse happens exactly
 * once. `LISTAGG ... WITHIN GROUP (ORDER BY index)` collapses to plain
 * array order (posexplode's `pos` IS the array index), and the
 * MAX-over-non-blank device rollup is `array_max(filter(...))`.
 *
 * [[applyFlatten]] keeps the reference-shaped flatten/groupBy/join
 * formulation (LATERAL FLATTEN → generator semantics, SURVEY §2 J3/UDTF)
 * as the executable spec — PipelineSpec asserts row-identical output on
 * the edge-case fixture. Its aggregations and join all key on
 * `mdr_report_key`, so EnsureRequirements shares one hash exchange;
 * per-report arrays are bounded (<100 elements), no skew handling needed.
 */
object StgMaude {

  private val NaValues = Seq("N/A", "NA", "UNKNOWN", "NOT AVAILABLE")

  /** Scale primary: one scan, zero shuffles — every per-report rollup is
    * an array HOF in the projection itself. */
  def apply(maudeRaw: DataFrame): DataFrame = {
    // MAX over non-blank values, blanks/NULLs only decide eligibility —
    // the kept value stays untrimmed (F.firstNonBlank's contract)
    def maxNonBlank(arr: Column) =
      array_max(filter(arr, x => x.isNotNull && trim(x) =!= ""))
    // LISTAGG(trimToNull(text), '\n' ORDER BY index): array order is the
    // flatten index; NULL/blank fragments are skipped; all-NULL (or
    // missing array) yields '', never NULL — Snowflake LISTAGG semantics
    val narrative = coalesce(
      array_join(
        filter(transform(col("raw.mdr_text"), m => F.trimToNull(m.getField("text"))),
          x => x.isNotNull),
        "\n"),
      lit(""))
    val et  = col("raw.event_type")
    val etU = upper(trim(et))
    maudeRaw.select(
      col("raw.mdr_report_key").as("mdr_report_key"),
      col("raw.report_number").as("report_number"),
      F.parseYyyymmdd(col("raw.date_received")).as("date_received"),
      F.parseYyyymmdd(col("raw.event_date")).as("event_date"),
      when(etU.isin("INJURY", "MALFUNCTION", "DEATH"), initcap(trim(et)))
        .when(et.isNull || trim(et) === "" || etU.isin(NaValues: _*),
          lit("No Answer Provided"))
        .otherwise(lit("Other"))
        .as("event_type"),
      et.as("event_type_raw"),
      col("raw.product_problem").as("product_problem"),
      col("raw.device_report_product_code").as("product_code"),
      coalesce(col("raw.device_name"),
        maxNonBlank(col("raw.device").getField("device_name"))).as("device_name"),
      coalesce(col("raw.brand_name"),
        maxNonBlank(col("raw.device").getField("brand_name"))).as("brand_name"),
      coalesce(col("raw.manufacturer_d_name"),
        maxNonBlank(col("raw.device").getField("manufacturer_d_name"))).as("manufacturer_name"),
      coalesce(col("raw.manufacturer_g1_name"),
        maxNonBlank(col("raw.device").getField("manufacturer_g1_name"))).as("manufacturer_g1_name"),
      narrative.as("narrative_text"),
      col("src_filename"),
      col("load_ts"),
      length(narrative).as("narrative_len"))
  }

  /** Executable spec: the reference's own flatten → aggregate → join
    * shape (stg_maude.sql:32-87), kept as the LATERAL-FLATTEN/generator
    * formulation and the cross-check for [[apply]]. */
  def applyFlatten(maudeRaw: DataFrame): DataFrame = {
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
