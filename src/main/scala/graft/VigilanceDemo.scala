package graft

import graft.checks.Checks
import graft.models.Pipeline
import org.apache.spark.sql.SparkSession

/**
 * CLI entry for the vigilance pipeline: ingest a MAUDE NDJSON landing dir +
 * manufacturer seed CSV, build stg → fact → counts → signals, run the
 * reference's schema tests, and print the strongest early signals.
 *
 * Usage: runMain graft.VigilanceDemo <landingDir> <seedCsv> [martsOutDir]
 */
object VigilanceDemo {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: VigilanceDemo <landingDir> <seedCsv> [martsOutDir]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("vigilance")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val models = Pipeline.run(spark, args(0), args(1), args.lift(2))

    println(s"[vigilance] stg_maude rows:  ${models.stgMaude.count()}")
    println(s"[vigilance] fact rows:       ${models.factAdverseEvents.count()}")
    println(s"[vigilance] quarterly rows:  ${models.aeCountsQ.count()}")

    println("[vigilance] dbt-style checks (failures per test):")
    Checks.run(Pipeline.checks(models)).toSeq.sortBy(_._1).foreach {
      case (name, n) => println(f"[vigilance]   $name%-34s $n%d")
    }

    println("[vigilance] top early signals by |z|:")
    models.vAeEarlySignals
      .where("z_score IS NOT NULL")
      .orderBy(org.apache.spark.sql.functions.abs(
        org.apache.spark.sql.functions.col("z_score")).desc)
      .show(10, truncate = false)

    // UC1 "similar cases" (reference README.md:73,117): hybrid BM25 + vector
    // top-K over the fact narratives. Embeddings come from the stub codec
    // (a real encoder drops in behind the same Codec trait).
    import org.apache.spark.sql.functions._
    val corpus = models.factAdverseEvents
      .where(col("narrative_text").isNotNull && col("narrative_len") > 0)
      .select(col("event_id"), col("narrative_text"),
        col("narrative_text").cast("binary").as("payload"),
        lit("text").as("modality"),
        xxhash64(col("event_id")).as("asset_id"))
    val codec = new graft.operators.Multimodal.StubCodec(16)
    val embedded = graft.operators.Multimodal
      .featurize(corpus, codec).toDF()
      .select(col("asset_id"), col("feature"))
      .join(corpus, Seq("asset_id"))
    val queryText = "pump leak detected"
    val queryVec = codec.decodeAndEmbed(
      queryText.getBytes("UTF-8")).map(_.toDouble).toSeq
    println(s"""[vigilance] UC1 similar cases for "$queryText":""")
    graft.operators.HybridSearch.similarCases(
        embedded, "event_id", "narrative_text", "feature",
        queryText, queryVec, k = 5)
      .show(5, truncate = 60)

    // Interactive serving path (the P95 < 1.5 s SLO shape,
    // README.md:87,139): build the search index once — cached BM25
    // postings + IVF assignment — then answer repeated queries warm.
    val centroids = embedded.limit(8)
      .select(col("event_id"), col("feature"))
    val idx = graft.operators.HybridSearch.buildIndex(
      embedded, "event_id", "narrative_text", "feature", centroids)
    try {
      Seq("battery depleted", "software error code").foreach { q =>
        val qv = codec.decodeAndEmbed(q.getBytes("UTF-8")).map(_.toDouble).toSeq
        println(s"""[vigilance] warm similar cases for "$q":""")
        graft.operators.HybridSearch
          .similarCasesIndexed(idx, q, qv, k = 3, nProbe = 2)
          .show(3, truncate = 60)
      }
    } finally idx.close()
    spark.stop()
  }
}
