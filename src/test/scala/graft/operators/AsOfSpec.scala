package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0))
    .toDF("sym", "ts", "px")

  private lazy val trades = Seq(
    ("A", 5L, 100L),   // before any quote → null
    ("A", 10L, 101L),  // equal ts matches
    ("A", 25L, 102L),  // between → quote@20
    ("A", 99L, 103L),  // after all → quote@30
    ("B", 14L, 104L),  // before B's only quote → null
    ("C", 50L, 105L))  // key with no quotes → null
    .toDF("sym", "ts", "trade_id")

  test("as-of join attaches latest right row at or before each left ts") {
    val out = AsOf.join(trades, quotes, Seq("sym"), "ts")
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      100L -> None, 101L -> Some(1.0), 102L -> Some(2.0),
      103L -> Some(3.0), 104L -> None, 105L -> None))
  }

  test("range join matches the naive non-equi join across bin widths") {
    val pts = (0L until 200L).map(i => ("k" + (i % 3), i * 7 % 500, i))
      .toDF("key", "ts", "pt_id")
    val ivs = (0L until 30L).map(i =>
      ("k" + (i % 3), i * 16 % 400, i * 16 % 400 + (i % 5) * 20, i))
      .toDF("key", "s", "e", "iv_id")
    val naive = pts.join(ivs, Seq("key"))
      .filter(col("ts").between(col("s"), col("e")))
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 17L, 64L, 1000L)) {
      val bucketized = RangeJoin.pointInInterval(pts, ivs, Seq("key"),
          "ts", "s", "e", binWidth = w)
        .select("pt_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketized === naive, s"binWidth=$w")
    }
  }

  test("as-of join output keeps every left row exactly once") {
    val out = AsOf.join(trades, quotes, Seq("sym"), "ts")
    assert(out.count() === trades.count())
    assert(out.select("trade_id").distinct().count() === trades.count())
  }
}
