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
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    for (q <- Seq("q78_dsir_resample", "q67_dsir_weights", "q93_canonical_docs", "q34_dedup_components", "q210_kmv_replay", "q200_m4_replay"); i <- 1 to 3)
      time(s"${q}_$i")(SparkEntry.queries(q)(spark, d).count())
    spark.stop()
  }
}
