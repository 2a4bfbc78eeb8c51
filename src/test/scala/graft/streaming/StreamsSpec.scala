package graft.streaming

import graft.SparkSpec
import graft.models.MaudeFixture
import graft.sources.MaudeIngest
import java.nio.file.Files
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("incremental pipeline: streamed landing files land in the fact sink") {
    val base = Files.createTempDirectory("maude_stream")
    val (landing, seed) = MaudeFixture.write(base)
    val out = base.resolve("marts").toString
    val seedDf = MaudeIngest.manufacturerSeed(spark, seed)

    val q = Streams.incrementalPipeline(
        MaudeIngest.stream(spark, landing), seedDf, out)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$out/fact_adverse_events_stream").count() === 6)

    // a late-arriving file is picked up incrementally, not reprocessed
    Files.writeString(java.nio.file.Paths.get(landing, "maude_part1.json"),
      """{"mdr_report_key":"2001","report_number":"RN-7","date_received":"20210101","event_type":"INJURY","mdr_text":[{"text":"late leak"}]}""")
    val q2 = Streams.incrementalPipeline(
        MaudeIngest.stream(spark, landing), seedDf, out)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .start()
    q2.awaitTermination()
    val fact = spark.read.parquet(s"$out/fact_adverse_events_stream")
    assert(fact.count() === 7)
    assert(fact.filter(col("mdr_report_key") === "2001")
      .collect().head.getAs[String]("failure_mode") === "LEAK")
  }

  test("session_window semantics (batch-mode evaluation of the streaming op)") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val events = Seq((1L, ts(0)), (1L, ts(100)), (1L, ts(5000)), (2L, ts(10)))
      .toDF("user_id", "ts")
    val out = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_events"))
    assert(out.count(_._1 == 1L) === 2)  // gap 4900s > 30min splits user 1
    assert(out.count(_._1 == 2L) === 1)
  }
}
