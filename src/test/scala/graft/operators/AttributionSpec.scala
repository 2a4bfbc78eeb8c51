package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user", "t", "id", "typ")
      .withColumn("ts", timestamp_seconds(col("t")))

  private def run(df: org.apache.spark.sql.DataFrame, lookbackSec: Long = 100L) =
    Attribution.credits(df, col("user"), col("ts"), col("id"),
      col("typ") === "conv", col("typ").isin("click", "view"), col("typ"),
      expr(s"INTERVAL $lookbackSec SECONDS"))

  test("credits: hand-checked first/last/linear over one conversion") {
    val df = ev((1L, 10L, 1L, "click"), (1L, 20L, 2L, "view"),
      (1L, 30L, 3L, "click"), (1L, 40L, 9L, "conv"))
    val got = run(df).collect()
      .map(r => (r.getString(4), r.getLong(2), r.getDouble(5)))
    assert(got.count(_._1 == "first_touch") === 3)
    assert(got.filter(_._1 == "first_touch")
      .map(x => x._2 -> x._3).toMap.apply(1L) === 1.0)
    assert(got.filter(_._1 == "first_touch").collect {
      case (_, id, c) if id != 1L => c }.forall(_ === 0.0))
    assert(got.filter(_._1 == "last_touch")
      .map(x => x._2 -> x._3).toMap.apply(3L) === 1.0)
    got.filter(_._1 == "linear").foreach { case (_, _, c) =>
      assert(c === 1.0 / 3.0) }
  }

  test("credits: lookback excludes stale touches; later touches never credit") {
    val df = ev((1L, 10L, 1L, "click"),  // 90s before conv: inside 100s
      (1L, 5L, 2L, "view"),              // 95s before: inside
      (1L, 150L, 3L, "click"),           // after the conversion
      (1L, 100L, 9L, "conv"))
    val touches = run(df).filter(col("model") === "linear")
      .collect().map(_.getLong(2)).toSet
    assert(touches === Set(1L, 2L))
    val none = run(ev((1L, 10L, 1L, "click"), (1L, 500L, 9L, "conv")))
    assert(none.count() === 0, "conversion with no in-window touch is absent")
  }

  test("credits: equal timestamps break first/last by id deterministically") {
    val df = ev((1L, 10L, 5L, "click"), (1L, 10L, 2L, "view"),
      (1L, 40L, 9L, "conv"))
    val first = run(df).filter(col("model") === "first_touch" &&
      col("credit") > 0).collect().head.getLong(2)
    val last = run(df).filter(col("model") === "last_touch" &&
      col("credit") > 0).collect().head.getLong(2)
    assert(first === 2L && last === 5L)
  }

  test("credits: per-conversion windows are independent across users") {
    val df = ev((1L, 10L, 1L, "click"), (1L, 40L, 8L, "conv"),
      (2L, 20L, 2L, "view"), (2L, 50L, 9L, "conv"))
    val linear = run(df).filter(col("model") === "linear").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(linear.toSet === Set((8L, 1L, 1.0), (9L, 2L, 1.0)))
  }
}
