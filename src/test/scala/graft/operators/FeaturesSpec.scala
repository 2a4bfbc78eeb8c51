package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Supervised encoders: leakage exclusion, singleton NULLs, WOE smoothing. */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncodeLoo: excludes the row's own label; singletons NULL") {
    val rows = Seq((1L, "a", 1L), (2L, "a", 0L), (3L, "a", 1L),
      (4L, "b", 1L)).toDF("id", "cat", "y")
    val got = Features.targetEncodeLoo(rows, Seq("id"), col("cat"), col("y"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // cat a: sum=2, n=3 → row1: (2-1)/2 = 0.5; row2: (2-0)/2 = 1.0
    assert(got(1L) === Some(0.5))
    assert(got(2L) === Some(1.0))
    assert(got(3L) === Some(0.5))
    assert(got(4L) === None, "a singleton category has no other rows")
  }

  test("targetEncodeLoo: constant-label category encodes that constant") {
    val rows = Seq((1L, "c", 1L), (2L, "c", 1L), (3L, "c", 1L))
      .toDF("id", "cat", "y")
    val te = Features.targetEncodeLoo(rows, Seq("id"), col("cat"), col("y"))
      .collect().map(_.getDouble(3)).toSet
    assert(te === Set(1.0))
  }

  test("targetEncodeLoo: broadcast below the category threshold, shuffled above") {
    val rows = (0 until 200).map(i => (i.toLong, s"c${i % 20}", (i % 2).toLong))
      .toDF("id", "cat", "y")
    def run(threshold: Long) =
      Features.targetEncodeLoo(rows, Seq("id"), col("cat"), col("y"),
        maxBroadcastCategories = threshold)
    // pin with size-based auto-broadcast OFF so the plan shape reflects
    // the operator's own guard, not Catalyst's small-table estimate
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val below = run(1000000L).queryExecution.executedPlan.toString
      assert(below.contains("BroadcastHashJoin"),
        s"below threshold must broadcast the stats side:\n$below")
      val above = run(5L).queryExecution.executedPlan.toString
      assert(!above.contains("BroadcastHashJoin"),
        s"above threshold must fall back to a shuffled join:\n$above")
      assert(above.contains("SortMergeJoin") || above.contains("ShuffledHashJoin"),
        s"expected a shuffled join above the threshold:\n$above")
      // the guard is a plan choice, never a value change
      def vals(t: Long) = run(t).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
      val (a, b) = (vals(1000000L), vals(5L))
      assert(a.keySet === b.keySet)
      a.foreach { case (k, v) =>
        assert(v.isNaN && b(k).isNaN || v === b(k), s"row $k differs") }
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("calibration: out-of-range scores clamp into the edge bins") {
    // contract is scores in [0,1]; 1.0 joins the top bin (no phantom
    // bucket) and a below-zero score lands VISIBLY in bin 0 (its
    // avg_score goes negative there) instead of a silent negative bin
    val rows = Seq((-0.2, 0L), (0.05, 0L), (1.0, 1L), (1.3, 1L))
      .toDF("s", "y")
    val got = Features.calibration(rows, col("s"), col("y"), buckets = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.keySet === Set(0L, 3L))
    assert(got(0L)._1 === 2L && got(0L)._2 < 0,
      "clamped negative score surfaces through bin 0's avg_score")
    assert(got(3L)._1 === 2L)
  }

  test("woeIv: hand-checked smoothed cells; direction and additivity") {
    // bin hi: 8 pos 2 neg; bin lo: 2 pos 8 neg → tp = tn = 10
    val rows = (1 to 8).map(_ => ("hi", 1L)) ++ (1 to 2).map(_ => ("hi", 0L)) ++
      (1 to 2).map(_ => ("lo", 1L)) ++ (1 to 8).map(_ => ("lo", 0L))
    val got = Features.woeIv(rows.toDF("bin", "y"), col("bin"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val pp = 8.5 / 10.5; val pn = 2.5 / 10.5
    val woe = BigDecimal(math.log(pp / pn))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("hi")._1 === 8L && got("hi")._2 === 2L)
    assert(got("hi")._3 === woe)
    assert(got("lo")._3 === -woe, "symmetric design ⇒ antisymmetric WOE")
    assert(got("hi")._4 > 0 && got("lo")._4 > 0,
      "IV terms are non-negative by construction (x·ln ratios co-signed)")
  }

  test("calibration: perfectly calibrated scores give zero ECE terms") {
    // in each bin the mean score equals the empirical rate exactly
    val rows = Seq.fill(4)((0.25, 1L)) ++ Seq.fill(12)((0.25, 0L)) ++
      Seq.fill(9)((0.75, 1L)) ++ Seq.fill(3)((0.75, 0L))
    val got = Features.calibration(rows.toDF("s", "y"), col("s"), col("y"),
        buckets = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got(1L) === ((16L, 0.25, 0.25, 0.0)))
    assert(got(3L) === ((12L, 0.75, 0.75, 0.0)))
  }

  test("calibration: score 1.0 joins the top bin; ECE weights by bin mass") {
    val rows = Seq((1.0, 1L), (1.0, 0L), (0.0, 0L), (0.0, 0L), (0.0, 0L),
      (0.0, 0L), (0.0, 0L), (0.0, 0L))
    val got = Features.calibration(rows.toDF("s", "y"), col("s"), col("y"),
        buckets = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(4))).toMap
    assert(got.keySet === Set(0L, 9L), "no phantom bin 10")
    // top bin: conf 1.0, acc 0.5, mass 2/8 → term 0.125; bottom exact
    assert(got(9L) === ((2L, 0.125)))
    assert(got(0L) === ((6L, 0.0)))
  }

  test("woeIv: an empty class stays finite through the ½ correction") {
    val rows = Seq(("only_pos", 1L), ("only_pos", 1L), ("mixed", 1L),
      ("mixed", 0L)).toDF("bin", "y")
    val got = Features.woeIv(rows, col("bin"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(!got("only_pos").isNaN && !got("only_pos").isInfinite)
    assert(got("only_pos") > got("mixed"))
  }
}
