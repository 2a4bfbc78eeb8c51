package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = spark.range(40000).select(
      (col("id") % 200).as("a"), (col("id") / 200).as("b"))
    for (n <- Seq(8, 16, 32)) {
      val base = java.nio.file.Files.createTempDirectory(s"z$n").toString + "/t"
      graft.functions.ZOrder.cluster(rows, col("a"), col("b"), n).write.parquet(base)
      val e = spark.read.parquet(base).groupBy(input_file_name())
        .agg((max("a") - min("a")).as("ea"), (max("b") - min("b")).as("eb"))
        .agg(avg("ea"), avg("eb")).head()
      println(f"ZEXT n=$n ea=${e.getDouble(0)}%.1f eb=${e.getDouble(1)}%.1f")
    }
    spark.stop()
  }
}
