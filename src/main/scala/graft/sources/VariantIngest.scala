package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Late-binding VARIANT ingest — the 1:1 analog of the reference's landing
 * table `MAUDE_RAW(raw VARIANT, src_filename, load_ts)` (README.md:102)
 * and its `raw:"path"::type` extraction style (stg_maude.sql:6-25).
 *
 * Where [[MaudeIngest]] is schema-first (the preferred path when the MAUDE
 * record shape is known), this source keeps the payload as a Spark 4
 * `VariantType` column: no schema at ingest, each query binds paths at
 * read time. Snowflake null-semantics are preserved exactly:
 *  - a missing path yields NULL, never an error ([[path]] uses
 *    `try_variant_get`);
 *  - `::type` casts are best-effort NULL-on-mismatch, matching VARIANT's
 *    tolerant casts under ANSI mode.
 */
object VariantIngest {

  /** Landing shape: one NDJSON object per line → `raw` VARIANT +
    * provenance columns, bad lines dropped as Snowflake's
    * `ON_ERROR = CONTINUE` would (`try_parse_json` → NULL filter). */
  def batch(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        try_parse_json(col("value")).as("raw"),
        input_file_name().as("src_filename"),
        current_timestamp().as("load_ts"))
      .filter(col("raw").isNotNull)

  /** `raw:"a"."b"::type` — late-bound path extraction with Snowflake
    * missing-path→NULL semantics. `jsonPath` uses `$.field.sub[0]` form. */
  def path(raw: Column, jsonPath: String, castTo: String): Column =
    try_variant_get(raw, jsonPath, castTo)

  /** The stg_maude header fields extracted VARIANT-style (the late-binding
    * twin of the schema-first staging extraction, stg_maude.sql:6-25). */
  def header(landed: DataFrame): DataFrame =
    landed.select(
      path(col("raw"), "$.mdr_report_key", "string").as("mdr_report_key"),
      path(col("raw"), "$.report_number", "string").as("report_number"),
      path(col("raw"), "$.date_received", "string").as("date_received_raw"),
      path(col("raw"), "$.event_type", "string").as("event_type_raw"),
      path(col("raw"), "$.product_code", "string").as("product_code"),
      // nested array element access, the `raw:"device"[0]:"brand_name"` analog
      path(col("raw"), "$.device[0].brand_name", "string").as("first_brand_name"),
      col("src_filename"), col("load_ts"))
}
