package graft

// Scratch profiling/plan-audit main (not part of the library surface).
import org.apache.spark.sql.SparkSession

object Profile {
  def main(args: Array[String]): Unit = {
    val aqe = sys.env.getOrElse("PROF_AQE", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", sys.env.getOrElse("PROF_COALESCE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val t0 = System.nanoTime()
    val per = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val q0 = System.nanoTime()
      fn(spark, d).count()
      name -> (System.nanoTime() - q0) / 1e9
    }
    println(f"PROF aqe=$aqe total=${(System.nanoTime() - t0) / 1e9}%.1f")
    per.sortBy(-_._2).take(5).foreach { case (n, t) => println(f"PROF   $n $t%.2f") }
    spark.stop()
  }
}
