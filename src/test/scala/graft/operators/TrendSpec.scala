package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("ewma matches the per-row reference on integer inputs, exactly") {
    val rows = Seq(
      ("a", 1, 100L), ("a", 2, 200L), ("a", 3, 50L), ("a", 4, 400L),
      ("a", 5, 0L), ("b", 1, 10L), ("b", 2, 30L))
    val out = Trend.ewma(rows.toDF("g", "t", "v"), Seq("g"), col("t"),
        col("v"), window = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    // reference: newest-first weights 1, 1/2, 1/4; denominator 2 - 2^(1-n)
    def ref(xs: Seq[Long]): Double = {
      val recent = xs.takeRight(3).reverse
      val num = recent.zipWithIndex.map { case (x, k) => x / math.pow(2, k) }.sum
      math.rint(num / (2.0 - math.pow(2.0, -(recent.size - 1))) * 10000) / 10000
    }
    val series = Map("a" -> Seq(100L, 200L, 50L, 400L, 0L), "b" -> Seq(10L, 30L))
    for ((g, xs) <- series; t <- 1 to xs.size)
      assert(out((g, t)) === ref(xs.take(t)), s"($g, $t)")
  }

  test("ewma of a constant series is the constant; single row is itself") {
    val rows = (1 to 20).map(t => ("c", t, 7L))
    val out = Trend.ewma(rows.toDF("g", "t", "v"), Seq("g"), col("t"),
      col("v"), window = 8).select("ewma").collect().map(_.getDouble(0))
    assert(out.forall(_ === 7.0))
  }

  test("ewma NULL policy: a NULL observation contributes 0 but keeps its lag slot") {
    val rows = Seq(("a", 1, Some(100L)), ("a", 2, None), ("a", 3, Some(400L)))
    val out = Trend.ewma(rows.toDF("g", "t", "v"), Seq("g"), col("t"),
        col("v"), window = 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    // t3 lags newest-first: 400, NULL→0, 100 ⇒ (400 + 0/2 + 100/4) / (2 − 2^-2)
    // a position-dropping collect would instead see [400, 100] ⇒ 450/1.5 = 300
    assert(out(3) === math.rint(425.0 / 1.75 * 10000) / 10000)
    // t2's own value is NULL: frame [100, NULL→0] ⇒ (0 + 100/2) / 1.5
    assert(out(2) === math.rint(50.0 / 1.5 * 10000) / 10000)
  }

  test("robust stats: med/mad/outliers match hand-computed values; stddev would hide the spike") {
    // 9 calm days at ~100 plus one 100x spike: med 100, dev median 2
    val xs = Seq(98L, 99L, 99L, 100L, 100L, 100L, 101L, 102L, 104L, 10000L)
    val rows = xs.zipWithIndex.map { case (v, i) => ("g", i, v) }
    val r = Trend.robustOutlierStats(rows.toDF("g", "t", "v"), Seq("g"),
      col("v"), z = 3.5).head()
    assert(r.getLong(1) === 10L)             // n
    assert(r.getDouble(2) === 100.0)         // med
    // devs sorted: 0,0,0,1,1,1,2,2,4,9900 -> interpolated median 1.0
    assert(r.getDouble(3) === 1.0)           // mad
    // 0.6745*dev > 3.5*1.0 only for the spike's dev of 9900
    assert(r.getLong(4) === 1L)
    // classic stddev z-score on the same data: the spike inflates sigma so
    // much that its own z stays tiny — the robust screen is the point
    val mean = xs.sum.toDouble / xs.size
    val sd = math.sqrt(xs.map(x => math.pow(x - mean, 2)).sum / (xs.size - 1))
    assert(math.abs((10000 - mean) / sd) < 3.5, "stddev z-score misses the spike")
  }

  test("robust stats: zero-MAD group flags any nonzero deviation, no division blowup") {
    val rows = (Seq.fill(9)(5L) :+ 6L).zipWithIndex.map { case (v, i) => ("c", i, v) }
    val r = Trend.robustOutlierStats(rows.toDF("g", "t", "v"), Seq("g"), col("v")).head()
    assert(r.getDouble(3) === 0.0)  // mad
    assert(r.getLong(4) === 1L)     // the single deviating row flags
  }

  test("ewma plan: one window over one shuffle, no joins") {
    val rows = (1 to 100).map(t => (s"g${t % 4}", t, t.toLong))
    val plan = Trend.ewma(rows.toDF("g", "t", "v").repartition(5), Seq("g"),
        col("t"), col("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"no join expected:\n$plan")
    assert(plan.split("Exchange").length - 1 <= 2,
      s"expected at most the repartition + one window exchange:\n$plan")
  }

  test("seasonalDecompose: hand-checked trend/seasonal, exact identity, partition-invariant bits") {
    // key A: 14 consecutive days, counts 10,20,...,140 (pos = day % 7)
    val rows = (0 until 14).map(i => ("A", i.toLong, (10L * (i + 1))))
    val df = rows.toDF("k", "day", "n")
    val out = Trend.seasonalDecompose(df, Seq("k"), col("day"), col("n"))
      .select("day", "n", "trend", "seasonal", "residual")
      .collect().map(r => (r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))).toMap
    // interior trend = plain 7-point centered mean: day 3 -> mean(10..70)=40
    assert(out(3)._2 === 40.0)
    assert(out(6)._2 === 70.0)
    // edge trend uses the observed frame: day 0 -> mean(10,20,30,40)=25
    assert(out(0)._2 === 25.0)
    // identity holds exactly: n == trend + seasonal + residual
    out.values.foreach { case (n, t, se, re) => assert(n.toDouble === t + se + re) }
    // same position-in-period -> same seasonal (day 1 and day 8)
    assert(out(1)._3 === out(8)._3)
    // linear series: detrended interior points are 0; day 3 and 10 share
    // pos 3, one interior (det 0) and one right-edge: seasonal = mean of
    // the two exact detrended values
    val det = (d: Long) => out(d)._1.toDouble - out(d)._2
    assert(out(3)._3 === (det(3) + det(10)) / 2.0)
    // partition-layout invariance, BITWISE (the lcm-scaling argument):
    val a = Trend.seasonalDecompose(df.repartition(7), Seq("k"), col("day"), col("n"))
      .select("day", "trend", "seasonal", "residual").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val b = Trend.seasonalDecompose(df.coalesce(1), Seq("k"), col("day"), col("n"))
      .select("day", "trend", "seasonal", "residual").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // keys are isolated: a second series does not bleed into A's frames
    val two = rows ++ (0 until 14).map(i => ("B", i.toLong, 1000L))
    val outA = Trend.seasonalDecompose(two.toDF("k", "day", "n"),
        Seq("k"), col("day"), col("n"))
      .filter(col("k") === "A").select("day", "trend").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(outA(3) === 40.0)
  }

  test("cusum: closed form equals the textbook recursion; dyadic guard") {
    // per-key series with a level shift midway; target 10, slack 0.5
    val xs = Seq(9L, 11L, 10L, 8L, 12L, 15L, 16L, 14L, 17L, 13L)
    val df = xs.zipWithIndex.map { case (x, i) => ("A", i.toLong, x) }
      .toDF("k", "day", "n")
    val out = Trend.cusum(df, Seq("k"), col("day"), col("n"),
        lit(10.0), slack = 0.5, threshold = 8.0)
      .select("day", "s", "cusum", "alarm").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1)
    // reference: the literal recursion C_t = max(0, C_{t-1} + x - 10.5)
    var c = 0.0
    val expected = xs.map { x => c = math.max(0.0, c + x - 10.5); c }
    assert(out.map(_._3).toSeq === expected)
    // running sum is the plain prefix sum of deviations
    assert(out.head._2 === (9 - 10.5))
    // alarms exactly where the reference crosses the threshold
    assert(out.map(_._4).toSeq === expected.map(_ > 8.0))
    // the detector resets: after the dip at day 3 the min caps at 0
    assert(out(0)._3 === 0.0 && out(1)._3 === 0.5)
    // non-dyadic slack is rejected (exactness contract)
    intercept[IllegalArgumentException] {
      Trend.cusum(df, Seq("k"), col("day"), col("n"), lit(10.0), 0.3, 8.0)
    }
  }

  test("interpolateLinear: hand-checked line between bracketing points") {
    // series: t=0 v=10, t=4 v=2 (gap 1..3), t=5 v=7
    val df = Seq(("k", 0L, 10L), ("k", 4L, 2L), ("k", 5L, 7L))
      .toDF("g", "t", "v")
    val got = Trend.interpolateLinear(df, Seq("g"), col("t"), col("v"))
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (0L, 1L, 10.0), (1L, 0L, 8.0), (2L, 0L, 6.0), (3L, 0L, 4.0),
      (4L, 1L, 2.0), (5L, 1L, 7.0)))
  }

  test("interpolateLinear: non-integer slopes are the exact single division") {
    // t=0 v=0, t=3 v=1: interior points 1/3, 2/3 as correctly-rounded
    // doubles of the Long-exact numerators
    val df = Seq(("k", 0L, 0L), ("k", 3L, 1L)).toDF("g", "t", "v")
    val got = Trend.interpolateLinear(df, Seq("g"), col("t"), col("v"))
      .orderBy("t").collect().map(_.getDouble(4))
    assert(got.toSeq === Seq(0.0, 0.0 + 1.0 * 1 / 3.0, 0.0 + 1.0 * 2 / 3.0, 1.0))
  }

  test("interpolateLinear: per-key spines are independent; no cross-key bleed") {
    val df = Seq(("a", 0L, 1L), ("a", 2L, 3L), ("b", 10L, 100L), ("b", 12L, 0L))
      .toDF("g", "t", "v")
    val got = Trend.interpolateLinear(df, Seq("g"), col("t"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4))).toSet
    assert(got === Set(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0),
      ("b", 10L, 100.0), ("b", 11L, 50.0), ("b", 12L, 0.0)))
  }

  test("acf: alternating series shows -1 at lag 1, +1 at lag 2; exact pair counts") {
    val df = (0 until 20).map(i => ("k", i.toLong, if (i % 2 == 0) 1L else 2L))
      .toDF("g", "t", "v")
    val got = Trend.acf(df, Seq("g"), col("t"), col("v"), maxLag = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) === ((19L, -1.0)))
    assert(got(2L) === ((18L, 1.0)))
    assert(got(3L) === ((17L, -1.0)))
  }

  test("acf: constant series has undefined correlation (NULL), pairs still counted") {
    val df = (0 until 10).map(i => ("k", i.toLong, 5L)).toDF("g", "t", "v")
    val rows = Trend.acf(df, Seq("g"), col("t"), col("v"), maxLag = 2).collect()
    rows.foreach { r =>
      assert(r.isNullAt(3), "corr of a constant is undefined")
      assert(r.getLong(2) === 10L - r.getLong(1))
    }
  }

  test("acf: matches a driver-side Pearson reference on random series") {
    val rnd = new scala.util.Random(11)
    val xs = (0 until 50).map(_ => rnd.nextInt(100).toLong)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("g", "t", "v")
    def ref(k: Int): Double = {
      val a = xs.drop(k).map(_.toDouble)
      val b = xs.dropRight(k).map(_.toDouble)
      val n = a.size
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val sa = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum)
      val sb = math.sqrt(b.map(x => (x - mb) * (x - mb)).sum)
      cov / (sa * sb)
    }
    val got = Trend.acf(df, Seq("g"), col("t"), col("v"), maxLag = 5)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    (1 to 5).foreach { k =>
      assert(math.abs(got(k.toLong) - ref(k)) < 1e-6, s"lag $k") }
  }

  test("timeWeightedAvg: hand-checked hold-until-next weighting") {
    // (0,10) held 10s, (10,20) held 20s, (30,0) terminal (no weight)
    val df = Seq(("k", 0L, 10.0, 1L), ("k", 10L, 20.0, 2L), ("k", 30L, 0.0, 3L))
      .toDF("g", "t", "v", "id")
    val r = Trend.timeWeightedAvg(df, Seq("g"), col("t"), col("v"), col("id"))
      .collect().head
    assert((r.getLong(1), r.getLong(2)) === ((2L, 30L)))
    val want = BigDecimal((10.0 * 10 + 20.0 * 20) / 30.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === want)
    // a row-weighted mean would say 10 — the bias twap corrects
    assert(math.abs(r.getDouble(3) - 10.0) > 5.0)
  }

  test("timeWeightedAvg: single-observation keys have no intervals and are absent") {
    val df = Seq(("a", 0L, 5.0, 1L), ("b", 0L, 1.0, 1L), ("b", 4L, 9.0, 2L))
      .toDF("g", "t", "v", "id")
    val got = Trend.timeWeightedAvg(df, Seq("g"), col("t"), col("v"), col("id"))
      .collect().map(r => r.getString(0)).toSet
    assert(got === Set("b"))
  }

  test("timeWeightedAvg: simultaneous rows are ordered by the tie-break") {
    // two rows at t=0: id order decides which value holds the interval
    val df = Seq(("k", 0L, 100.0, 2L), ("k", 0L, 1.0, 1L), ("k", 10L, 0.0, 3L))
      .toDF("g", "t", "v", "id")
    val r = Trend.timeWeightedAvg(df, Seq("g"), col("t"), col("v"), col("id"))
      .collect().head
    // id=1 (v=1) holds 0s to id=2; id=2 (v=100) holds the full 10s
    assert(r.getDouble(3) === 100.0)
  }

  private def tsMap(rows: Seq[(String, Long, Long)]) =
    Trend.theilSen(rows.toDF("g", "t", "v"), Seq("g"), col("t"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("theilSen: exact line recovers its slope; one outlier cannot move it") {
    // clean: v = 3t + 1 → every pairwise slope is exactly 3_000_000 micro
    val clean = (0L to 5L).map(t => ("a", t, 3 * t + 1))
    assert(tsMap(clean)("a") === ((6L, 15L, 3000000L)))
    // corrupt one point hard: the MEDIAN of 15 slopes still sits on a
    // clean-pair slope (OLS would be dragged far off)
    val dirty = clean.map { case (g, t, v) => if (t == 3L) (g, t, 1000L)
      else (g, t, v) }
    val got = tsMap(dirty)("a")
    assert(got._3 === 3000000L, s"breakdown resistance: $got")
  }

  test("theilSen: negative slopes floor toward -inf identically to the oracle") {
    // v = -t/2-ish: slopes dy/dx = -1/2 → floor(-500000.) in micro-units
    val rows = Seq(("d", 0L, 10L), ("d", 2L, 9L), ("d", 4L, 8L))
    // pairs: (0,2): -1/2 → -500000; (0,4): -2/4 → -500000; (2,4): -500000
    assert(tsMap(rows)("d") === ((3L, 3L, -500000L)))
    // a truly fractional negative slope floors DOWN, not toward zero
    val r2 = Seq(("e", 0L, 1L), ("e", 3L, 0L)) // slope -1/3
    assert(tsMap(r2)("e")._3 === -333334L,
      "floor(-333333.33) = -333334 — the pmod form, not truncation")
  }

  test("theilSen: lower median on even pair counts; single-point keys absent") {
    // 4 points, 6 pairs, slopes sorted: rank (6+1) div 2 = 3
    val rows = Seq(("m", 0L, 0L), ("m", 1L, 1L), ("m", 2L, 4L), ("m", 3L, 9L),
      ("solo", 5L, 5L))
    val got = tsMap(rows)
    // slopes: 0-1:1, 0-2:2, 0-3:3, 1-2:3, 1-3:4, 2-3:5 → rank-3 value = 3
    assert(got("m") === ((4L, 6L, 3000000L)))
    assert(!got.contains("solo"))
  }

  private def m4(rows: Seq[(String, Long, Long)], buckets: Int) =
    Trend.m4Downsample(rows.toDF("g", "t", "v"), Seq("g"), col("t"),
        col("v"), buckets)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap

  test("m4Downsample: first/last/min/max per bin, exact bin edges") {
    // 8 ticks, 2 buckets: t 0..3 → bin 0, t 4..7 → bin 1
    val rows = (0L to 7L).map(t => ("k", t, (t * t % 11)))
    val got = m4(rows, buckets = 2)
    // bin 0: v = 0,1,4,9 → first (0,0) last (3,9) min 0 max 9
    assert(got(("k", 0L)) === ((4L, 0L, 0L, 3L, 9L, 0L, 9L)))
    // bin 1: t=4..7 → v = 5,3,3,5 → first (4,5) last (7,5) min 3 max 5
    assert(got(("k", 1L)) === ((4L, 4L, 5L, 7L, 5L, 3L, 5L)))
  }

  test("m4Downsample: duplicate timestamps collapse tie-free") {
    // two rows at t=0 (v 7 and 3): first = min-of-tick (3); two at t=9
    // (v 2 and 8): last = max-of-tick (8)
    val rows = Seq(("k", 0L, 7L), ("k", 0L, 3L), ("k", 5L, 5L),
      ("k", 9L, 2L), ("k", 9L, 8L))
    val got = m4(rows, buckets = 1)
    assert(got(("k", 0L)) === ((5L, 0L, 3L, 9L, 8L, 2L, 8L)))
  }

  test("m4Downsample: single-point series lands in bin 0 of any bucket count") {
    val got = m4(Seq(("solo", 42L, 17L)), buckets = 16)
    assert(got === Map(("solo", 0L) -> ((1L, 42L, 17L, 42L, 17L, 17L, 17L))))
  }

  test("ols2: recovers an exact plane; collinear features give NULL betas") {
    // y = 10 + 3·x1 − 2·x2 on a non-degenerate grid: exact recovery
    val grid = for { x1 <- 0L to 4L; x2 <- 0L to 3L }
      yield ("g", x1, x2, 10 + 3 * x1 - 2 * x2)
    val got = Trend.ols2(grid.toDF("k", "x1", "x2", "y"), Seq("k"),
        col("x1"), col("x2"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got("g") === ((20L, 10.0, 3.0, -2.0)))
    // x2 = 2·x1 exactly: the normal matrix is singular → NULLs, no throw
    val coll = (0L to 5L).map(x => ("c", x, 2 * x, x + 1))
    val r = Trend.ols2(coll.toDF("k", "x1", "x2", "y"), Seq("k"),
        col("x1"), col("x2"), col("y")).collect().head
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  private def outliers(rows: Seq[(String, Long, Long)], t: Double) =
    Trend.robustOutliers(rows.toDF("g", "id", "v"), Seq("g"), col("id"),
        col("v"), t)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

  test("robustOutliers: hand-checked modified z; only the spike flags") {
    // g: 10,12,14,16,100 -> med 14, deviations {4,2,0,2,86} -> mad 2;
    // mz(100) = 0.6745*86/2 = 29.0035; mz(10) = -1.349 (not flagged)
    val rows = Seq(("g", 1L, 10L), ("g", 2L, 12L), ("g", 3L, 14L),
      ("g", 4L, 16L), ("g", 5L, 100L))
    val got = outliers(rows, 3.5)
    assert(got.keySet === Set(5L))
    assert(got(5L) === ((14.0, 2.0, 29.0035)))
  }

  test("robustOutliers: even counts interpolate the median exactly") {
    // {1,3}: med 2.0 interpolated, mad 1.0; both rows at |mz| 0.6745
    val got = outliers(Seq(("g", 1L, 1L), ("g", 2L, 3L)), 0.5)
    assert(got.size === 2)
    assert(got(1L) === ((2.0, 1.0, -0.6745)) && got(2L) === ((2.0, 1.0, 0.6745)))
  }

  test("robustOutliers: zero-MAD groups are excluded, never a divide-by-zero") {
    // >50% of mass on one value -> mad 0: no outlier is decidable
    val rows = Seq.fill(4)(("z", 1L, 7L)).zipWithIndex
      .map { case ((g, _, v), i) => (g, i.toLong, v) } :+ (("z", 9L, 1000L))
    assert(outliers(rows, 3.5).isEmpty)
  }
}
