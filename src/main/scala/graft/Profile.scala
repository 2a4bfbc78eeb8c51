package graft

// Scratch profiling main (not part of the library surface; delete freely).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val docs = Tables.documents(spark, d)
    time("docs_count")(docs.count())
    val sh = docs.select(col("doc_id").as("doc"),
      explode(graft.functions.Text.shingles(graft.functions.Text.tokens(col("text")), 3)).as("sh"))
    time("shingle_explode")(sh.count())
    val sig = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16)
    time("signatures")(sig.count())
    time("full_q20")(graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 4, 4).count())
    time("full_q20_again")(graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 4, 4).count())
    time("q05_priority")(SparkEntry.queries("q05_priority_class")(spark, d).count())
    time("q05_again")(SparkEntry.queries("q05_priority_class")(spark, d).count())
    time("q01_again")(SparkEntry.queries("q01_pricing_summary")(spark, d).count())
    time("q16_brute")(SparkEntry.queries("q16_knn_brute")(spark, d).count())
    time("q22_neardup")(SparkEntry.queries("q22_embedding_neardup")(spark, d).count())
    spark.stop()
  }
}
