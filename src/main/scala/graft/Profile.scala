package graft

// Scratch profiling/plan-audit main (not part of the library surface).
import org.apache.spark.sql.SparkSession

object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val df = SparkEntry.queries("q20_minhash_lsh")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("AFTER EXEC isFinal: " + p.contains("isFinalPlan=true"))
    println("ReusedExchange: " + p.contains("ReusedExchange"))
    println("ShuffledHashJoin: " + p.contains("ShuffledHashJoin"))
    println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("ShuffleQueryStage") || l.contains("minhashshasig")).take(12).mkString("\n"))
    spark.stop()
  }
}
