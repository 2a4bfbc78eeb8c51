package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: key "hot" holds 90% of rows
  private lazy val skewed = (0 until 1000).map { i =>
    (if (i < 900) "hot" else s"cold_${i % 7}", i.toLong, i * 0.5)
  }.toDF("k", "id", "v")

  test("salted aggregate equals direct groupBy on skewed keys") {
    val direct = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"), max(col("id")).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val salted = Salt.aggregate(skewed, Seq("k"), col("id"), buckets = 8,
      partials = Seq(count(lit(1)).as("pn"), sum(col("v")).as("ps"), max(col("id")).as("pm")),
      combines = Seq(sum(col("pn")).as("n"), sum(col("ps")).as("s"), max(col("pm")).as("m")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(salted === direct)
  }

  test("salted join equals plain join (inner and left), spreads hot key") {
    val dim = Seq(("hot", "H"), ("cold_1", "C1"), ("cold_3", "C3"), ("absent", "A"))
      .toDF("k", "label")
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("k"), jt)
        .select(col("id"), col("label")).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      val salted = Salt.join(skewed, dim, Seq("k"), col("id"), buckets = 8, jt)
        .select(col("id"), col("label")).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(salted === plain, s"join type $jt")
    }
  }

  test("salt buckets actually split the hot key") {
    val salts = skewed.filter(col("k") === "hot")
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts === 8, "hot key should spread across all 8 buckets")
  }

  test("skew report surfaces the hot key with exact diagnostics") {
    // 8 keys (hot + cold_0..6), 1000 rows, max 900:
    // skew_ratio = 900 * 8 / 1000 = 7.2 — "the heaviest reducer carries
    // 7.2x a uniform spread", i.e. salting with ~8 buckets levels it
    val rows = Salt.skewReport(skewed, Seq("k"), topK = 3).collect()
    assert(rows.length === 3)
    val top = rows.head
    assert(top.getAs[String]("k") === "hot")
    assert(top.getAs[Long]("cnt") === 900L)
    assert(top.getAs[Double]("share") === 0.9)
    assert(top.getAs[Long]("n_rows") === 1000L)
    assert(top.getAs[Long]("n_keys") === 8L)
    assert(top.getAs[Double]("skew_ratio") === 7.2)
    // ties among the cold keys break by key name ascending
    assert(rows(1).getAs[String]("k") < rows(2).getAs[String]("k"))
    // top-K compiles to distributed top-N, not a global sort or window
    val plan = Salt.skewReport(skewed, Seq("k"), topK = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
