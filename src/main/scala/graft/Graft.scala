package graft

import graft.functions.expressions.GraftExpressions
import org.apache.spark.sql.SparkSession

/**
 * Library entry point: one call gives a session wired the way the engine
 * expects — UTC semantics, nanos-tolerant parquet reads, sized shuffles,
 * and the native graft expressions registered for both the DataFrame API
 * and plain `spark.sql` (`graft_cosine_sim`, `graft_shingles`).
 *
 * A reference user's switch path:
 * {{{
 * val spark = Graft.session()                       // or Graft.configure(existing)
 * Graft.registerTables(spark, "/data/sf0.1")        // tables as temp views
 * spark.sql("SELECT graft_cosine_sim(a.embedding, b.embedding) ...")
 * graft.models.Pipeline.run(spark, landing, seed)   // the vigilance DAG
 * }}}
 */
object Graft {

  /** Apply engine configs + function registration to an existing session,
    * and attach the engine's optimizer rules (idempotently) — the runtime
    * twin of deploying with
    * `spark.sql.extensions=graft.GraftSparkExtensions`.
    *
    * ANSI contract: the engine's overflow-safety arguments assume ANSI
    * arithmetic (the Spark 4 default) — e.g. ZOrder.zoneMap's range
    * normalization multiplies by 2^31-1 and relies on ANSI to fail loudly
    * past a 2^32 dimension range instead of silently wrapping into
    * garbage buckets. configure() PINS ANSI on only when the session is
    * already at the default; a host session that explicitly disabled it
    * keeps its setting (forcing it session-wide would change the host's
    * OWN queries — silent-null casts and wrapping arithmetic would start
    * throwing). Operators that require the guard assert it locally
    * (ZOrder.zoneMap throws up front under a non-ANSI session). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // zstd for parquet writes (engine default; snappy is Spark's):
    // measured on the 10M-row mart write, zstd produced 374 MB vs
    // snappy's 758 MB at comparable-or-better wall time on a
    // throughput-bound disk — at 100 TB, halving the bytes written is
    // halving the storage-side bottleneck, and zstd parquet is readable
    // by every engine in the interop story (DuckDB verified).
    spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
    if (spark.conf.get("spark.sql.ansi.enabled", "true").toBoolean)
      spark.conf.set("spark.sql.ansi.enabled", "true")
    else
      org.apache.log4j.Logger.getLogger(getClass)
        .warn("spark.sql.ansi.enabled=false on host session: graft keeps " +
          "your setting, but ANSI-guarded operators (ZOrder.zoneMap) will " +
          "refuse to run — see Graft.configure scaladoc")
    GraftExpressions.register(spark)
    Seq(graft.plans.BoundLevenshtein, graft.plans.MvRewrite).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
    spark
  }

  /** Build a local session with the engine defaults. `cores` also sizes
    * `spark.sql.shuffle.partitions` — one reducer per core locally; on a
    * cluster, set partitions to 2-3× total executor cores instead. */
  def session(cores: Int = Runtime.getRuntime.availableProcessors(),
              appName: String = "graft"): SparkSession =
    configure(SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .appName(appName)
      .getOrCreate())

  /** Register every driver-testdata table under its name as a temp view so
    * the whole query surface is reachable from `spark.sql`. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.table(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }
}
