package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Loaders for the driver-generated benchmark tables
 * (`/root/testdata/sf*` — see TESTDATA.md). One parquet file per table.
 *
 * The driver has shipped `events.parquet` with two physical encodings of the
 * `ts` column across rounds: INT64 TIMESTAMP(NANOS) (which Spark's parquet
 * reader rejects by default — [PARQUET_TYPE_ILLEGAL] — and we read via
 * `spark.sql.legacy.parquet.nanosAsLong` + truncate to micros) and plain
 * TIMESTAMP(MICROS) without timezone (which Spark reads as TIMESTAMP_NTZ).
 * `events()` normalizes both to the same session-TZ TimestampType column:
 * every session in this repo pins `spark.sql.session.timeZone=UTC`, so the
 * NTZ→LTZ cast is micros-bit-identical to what DuckDB (the correctness
 * oracle) sees reading the same file into its native TIMESTAMP.
 */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Attach one embedding per document by CYCLING the embedding table:
    * doc `i` gets the `(i mod nEmb)`-th vector in `vec_id` order — the
    * fixture convention q128 and the bench SLO corpus use to give every
    * document a vector leg. The mapping goes through a DENSE index of
    * the vector table, never its raw id: vec ids are contiguous on the
    * driver testdata but HOLED on tiled scale-up corpora
    * ([[graft.ScaleUp]] offsets each tile by a power of 10), and the
    * previous `pmod(doc_id, nEmb) === vec_id` equi-join silently
    * dropped every document whose residue fell in a hole — found as a
    * 19,270-vs-48,170-row q128 mismatch in the first sf1 correctness
    * gate (CORRECTNESS_sf1, round 14); the driver-sf hashes are
    * unchanged because there `__vidx == vec_id`. The single-partition
    * index pass is sound because the embedding table is this join's
    * BROADCAST side by construction (serving-cache-sized); the ids are
    * contiguous 0..n-1 because `monotonically_increasing_id` numbers
    * rows consecutively within one partition. */
  def cycleEmbeddings(docs: DataFrame, emb: DataFrame, nEmb: Long): DataFrame = {
    val embIdx = emb.select(col("vec_id"), col("embedding"))
      .coalesce(1).sortWithinPartitions(col("vec_id"))
      .select(col("embedding"), monotonically_increasing_id().as("__vidx"))
    docs.join(broadcast(embIdx),
        pmod(col("doc_id"), lit(nEmb)) === col("__vidx"))
      .drop("__vidx")
  }

  /** `events` with `ts` as a microsecond TimestampType column (see scaladoc). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
}
