package graft.models

import org.apache.spark.sql.types._

/**
 * Schema of one MAUDE adverse-event NDJSON record — every path the
 * reference's staging model reads (stg_maude.sql:6-25,35-44,53-55; field
 * census in FIXTURES.md §1). Schema-first parsing reproduces Snowflake
 * VARIANT late-binding semantics: a missing path yields NULL, never an
 * error.
 */
object MaudeSchema {

  val deviceElement: StructType = StructType(Seq(
    StructField("manufacturer_d_name", StringType),
    StructField("manufacturer_g1_name", StringType),
    StructField("brand_name", StringType),
    StructField("device_name", StringType)))

  val mdrTextElement: StructType = StructType(Seq(
    StructField("text", StringType)))

  /** The `raw` record itself (Snowflake's VARIANT column). */
  val raw: StructType = StructType(Seq(
    StructField("mdr_report_key", StringType),
    StructField("report_number", StringType),
    StructField("date_received", StringType),   // 'YYYYMMDD', may be malformed
    StructField("event_date", StringType),      // 'YYYYMMDD'
    StructField("event_type", StringType),
    StructField("product_problem", StringType),
    StructField("device_report_product_code", StringType),
    StructField("device_name", StringType),
    StructField("brand_name", StringType),
    StructField("manufacturer_d_name", StringType),
    StructField("manufacturer_g1_name", StringType),
    StructField("device", ArrayType(deviceElement)),
    StructField("mdr_text", ArrayType(mdrTextElement))))

  /** Landing-table shape: raw VARIANT + ingest provenance (README.md:102). */
  val landing: StructType = StructType(Seq(
    StructField("raw", raw),
    StructField("src_filename", StringType),
    StructField("load_ts", TimestampType)))

  /** Manufacturer canonicalization seed (seeds/manufacturer.csv:1). */
  val manufacturer: StructType = StructType(Seq(
    StructField("raw_name", StringType),
    StructField("canonical_name", StringType),
    StructField("manufacturer_id", LongType)))
}
