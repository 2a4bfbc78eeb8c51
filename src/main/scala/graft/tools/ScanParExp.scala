package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 experiment: size the single-row-group scan bottleneck — the
  * driver testdata ships each table as ONE parquet row group, so every
  * query's stage 1 (scan + fused scan-side work + partial aggregation)
  * runs on ONE core regardless of `local[N]`. Times a lineitem
  * aggregate as-is vs with an early hash repartition, warm medians. */
object ScanParExp {
  private def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c1"),
        col("l_quantity"), col("l_discount"), col("l_tax"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("c1"), sum("l_quantity"), avg("l_discount"), avg("l_tax"),
        count(lit(1)))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm
    agg(li).collect(); agg(li.repartition(32, col("l_orderkey"))).collect()
    val plain = (1 to 7).map(_ => time(agg(li).collect()))
    val repar = (1 to 7).map(_ => time(agg(li.repartition(32, col("l_orderkey"))).collect()))
    val scanOnly = (1 to 7).map(_ => time(
      li.select(count(lit(1))).collect()))
    println(f"[scanexp] plain=${med(plain)}%.3f repart=${med(repar)}%.3f countonly=${med(scanOnly)}%.3f")
    spark.stop()
  }
}
