package graft.sources

import graft.models.MaudeSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * NDJSON ingest of MAUDE records (reference README.md:99-103: S3 stage →
 * `COPY INTO MAUDE_RAW(raw VARIANT, src_filename, load_ts)`, one JSON
 * object per line, gzip transparent).
 *
 * Spark realization: schema-first `spark.read.json` (PERMISSIVE — missing
 * fields are NULL, exactly like VARIANT path access), the parsed fields
 * reassembled into a single `raw` struct column to preserve the landing
 * -table shape, plus `input_file_name()` / `current_timestamp()` as the
 * provenance columns. gzip decompression is transparent in Spark too.
 */
object MaudeIngest {

  private def withLandingShape(parsed: DataFrame): DataFrame =
    parsed.select(
      struct(MaudeSchema.raw.fieldNames.map(col).toSeq: _*).as("raw"),
      input_file_name().as("src_filename"),
      current_timestamp().as("load_ts"))

  /** Batch ingest of a directory/glob of NDJSON (optionally .gz) files. */
  def batch(spark: SparkSession, path: String): DataFrame =
    withLandingShape(spark.read.schema(MaudeSchema.raw).json(path))

  /**
   * Streaming ingest of the same landing path (the reference's
   * `target_lag` freshness concern, README.md:83,117): new files are
   * discovered incrementally; combine with `Trigger.AvailableNow` for
   * catch-up batches or `ProcessingTime` for continuous tailing.
   * `maxFilesPerTrigger` caps each micro-batch's file count — how an
   * AvailableNow catch-up over a large backlog becomes a SEQUENCE of
   * bounded merges instead of one full-backlog batch (the q218 shape;
   * at 100 TB the cap is what keeps a catch-up batch's shuffle
   * executor-memory-sized).
   */
  def stream(spark: SparkSession, path: String,
             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(MaudeSchema.raw)
    val rr = maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
    withLandingShape(rr.json(path))
  }

  /** Manufacturer seed CSV (RFC-4180 quoting, `RAW_NAME,CANONICAL_NAME,
    * MANUFACTURER_ID` header normalized to lower-case — dbt_project.yml:17-20). */
  def manufacturerSeed(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(MaudeSchema.manufacturer)
      .csv(path)
}
