package graft

// Scratch profiling/plan-audit main (not part of the library surface).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val audit = Seq("q01_pricing_summary", "q03_segment_revenue",
      "q04_region_nation_revenue", "q07_top_events_per_user", "q12_json_extract",
      "q14_dedup_exact", "q16_knn_brute", "q22_embedding_neardup")
    audit.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).mkString("; ")
      val schemas = "ReadSchema: [^\n]*".r.findAllIn(plan).mkString("; ")
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange")).map(_.trim.take(90)).mkString("\n  ")
      val codegen = "WholeStageCodegen".r.findAllIn(plan).length
      println(s"=== $name  (codegen spans: $codegen)")
      println(s"  pushed: $pushed")
      println(s"  read:   $schemas")
      println(s"  $joins")
    }
    spark.stop()
  }
}
