package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("measure captures shuffle, input, and task counts for a tagged block") {
    val (result, m) = Metrics.measure(spark, "metrics-spec") {
      (1 to 50000).toDF("x")
        .groupBy(col("x") % 100).agg(count(lit(1)))
        .collect().length
    }
    assert(result === 100)
    assert(m.tag === "metrics-spec")
    assert(m.jobs >= 1L && m.tasks > 0L)
    assert(m.shuffleWriteBytes > 0L, "a groupBy must shuffle")
    assert(m.shuffleReadBytes > 0L)
    assert(m.taskTimeMs > 0L)
  }

  test("measure isolates concurrent untagged work from the group's metrics") {
    // run an untagged shuffle FIRST; its stages must not leak into the
    // next capture (stage filtering is by the group's own job starts)
    spark.range(10000).groupBy(col("id") % 7).count().collect()
    val (_, m) = Metrics.measure(spark, "isolated") {
      spark.range(1000).select(sum(col("id"))).collect()
    }
    // a global sum is a tiny 2-stage job: metrics present but small
    assert(m.jobs >= 1L && m.tasks > 0L)
    assert(m.shuffleWriteBytes < 1000000L)
  }
}
