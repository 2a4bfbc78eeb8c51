package graft.streaming

import graft.models.{Pipeline => BatchPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/**
 * Structured Streaming realizations of the reference's freshness concerns
 * (Cortex Search `target_lag`, README.md:83,117 — there is no streaming SQL
 * in the reference repo; these are the Spark-native equivalents per
 * SURVEY.md §2.10).
 */
object Streams {

  /** Watermarked tumbling-window event counts per type — the streaming
    * analog of the quarterly batch rollup, for monitoring-grade freshness. */
  def windowedEventCounts(events: DataFrame, tsCol: String, typeCol: String,
                          window_ : String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(typeCol))
      .agg(count(lit(1)).as("n_events"))

  /** Native session windows (gap-based), streaming counterpart of the batch
    * [[graft.operators.Sessionize]] operator. */
  def sessionWindows(events: DataFrame, tsCol: String, userCol: String,
                     gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))

  /**
   * Streaming exact dedup: drop re-deliveries of the same key while their
   * event times fall within the watermark horizon (state for a key is
   * evictable once the watermark passes, so state size stays bounded —
   * the streaming counterpart of [[graft.operators.Dedup.exact]], needed
   * because landing feeds re-send MAUDE records across files).
   */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           keyCols: Seq[String],
                           watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /**
   * Incremental vigilance refresh: tail the NDJSON landing path and rebuild
   * the staging/fact transforms per micro-batch via foreachBatch (the
   * aggregating models need a batch context). `Trigger.AvailableNow`
   * gives catch-up-then-stop semantics; a processing-time trigger gives a
   * continuous `target_lag`.
   */
  def incrementalPipeline(maudeStream: DataFrame, manufacturer: DataFrame,
                          outDir: String): DataStreamWriter[Row] =
    maudeStream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val m = BatchPipeline.build(batch, manufacturer)
        m.factAdverseEvents.write.mode("append")
          .parquet(s"$outDir/fact_adverse_events_stream")
        ()
      }
}
