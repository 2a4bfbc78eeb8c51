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
    spark.stop()
  }
}
