package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), Some(10L)),
    (2L, Some("b"), None),
    (3L, None, Some(30L)),
    (4L, Some("a"), Some(10L)),
    (5L, Some("c"), None)
  ).toDF("id", "s", "v")

  test("exact profile: per-column n/null/distinct/min/max from one pass") {
    val p = Profile.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") === ((5L, 0L, 5L, "1", "5")))
    assert(p("s") === ((5L, 1L, 3L, "a", "c")))
    assert(p("v") === ((5L, 2L, 2L, "10", "30")))
  }

  test("min/max computed on the native type, not lexicographically") {
    val d = Seq(9L, 10L, 100L).toDF("x")
    val r = Profile.profile(d, Seq("x")).head()
    // lexicographic max of {"9","10","100"} would be "9"
    assert(r.getString(4) === "9" && r.getString(5) === "100")
  }

  test("approx profile agrees with exact within HLL tolerance, no Expand in plan") {
    val wide = (0 until 20000)
      .map(i => (i.toLong, s"u${i % 977}")).toDF("id", "u")
    val exact = Profile.profile(wide, Seq("id", "u")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.profileApprox(wide, Seq("id", "u"), rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact("u") === 977L)
    for (c <- Seq("id", "u"))
      assert(math.abs(approx(c) - exact(c)).toDouble / exact(c) < 0.1, c)
    val pApprox = Profile.profileApprox(wide, Seq("id", "u"))
      .queryExecution.executedPlan.toString
    assert(!pApprox.contains("Expand"),
      s"HLL path must not expand the scan:\n$pApprox")
    val pExact = Profile.profile(wide, Seq("id", "u"))
      .queryExecution.executedPlan.toString
    assert(pExact.contains("Expand"),
      "exact multi-distinct is the documented Expand plan")
  }

  test("histogram: integer-exact equi-width bins, empty bins absent, NULLs excluded") {
    import org.apache.spark.sql.functions.col
    // values 0..9 and 90..99 over 10 bins of width 10: bins 0 and 9 only
    val vals = ((0L to 9L) ++ (90L to 99L)).map(Option(_)) :+ (None: Option[Long])
    val h = Profile.histogram(vals.toDF("x"), col("x"), buckets = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(h.keySet === Set(0L, 9L), s"empty bins must be absent: ${h.keySet}")
    assert(h(0L) === ((10L, 0L, 9L)))
    assert(h(9L) === ((10L, 90L, 99L)))
  }

  test("one aggregate pass: no join, no window; explode input is one row") {
    val p = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("join") && !p.contains("Window"),
      s"profiler must be a single aggregate pass:\n$p")
  }

  test("weightedMedian: crossing row is the mass midpoint, hand-checked") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 10L))
      .toDF("k", "v", "w")
    val r = Profile.weightedMedian(df, Seq("k"), col("v"), col("w"))
      .collect()
    assert(r.length === 1)
    assert((r.head.getLong(1), r.head.getLong(2), r.head.getLong(3),
      r.head.getLong(4)) === ((3L, 10L, 12L, 12L)))
    // lower-median convention at an exact half split
    val even = Profile.weightedMedian(
      Seq(("g", 1L, 5L), ("g", 2L, 5L)).toDF("k", "v", "w"),
      Seq("k"), col("v"), col("w")).collect()
    assert(even.head.getLong(1) === 1L)
  }

  test("weightedMedian: duplicate values merge weights; groups independent") {
    val df = Seq(("a", 2L, 3L), ("a", 2L, 3L), ("a", 1L, 2L),
      ("b", 9L, 1L)).toDF("k", "v", "w")
    val got = Profile.weightedMedian(df, Seq("k"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("a") === ((2L, 6L)), "ties collapse before the window")
    assert(got("b") === ((9L, 1L)))
  }

  test("concentration: equal masses score gini 0 and hhi 1/n; hand-checked skew") {
    val eq = Seq(("g", 1L, 25L), ("g", 2L, 25L), ("g", 3L, 25L), ("g", 4L, 25L))
      .toDF("k", "m", "x")
    val r0 = Profile.concentration(eq, Seq("k"), col("m"), col("x")).collect().head
    assert(r0.getDouble(3) === 0.0)
    assert(r0.getDouble(4) === 0.25, "hhi of n equal members is 1/n")
    // masses 1,1,1,97: gini = 2*394/(4*100) - 5/4 = 0.72; hhi = 0.9412
    val skew = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 97L))
      .toDF("k", "m", "x")
    val r1 = Profile.concentration(skew, Seq("k"), col("m"), col("x"))
      .collect().head
    assert((r1.getLong(1), r1.getLong(2)) === ((4L, 100L)))
    assert(r1.getDouble(3) === 2.0 * 394 / (4.0 * 100) - 5.0 / 4.0)
    assert(r1.getDouble(4) === 0.9412)
  }

  test("concentration: a single member is perfectly concentrated") {
    val df = Seq(("g", 7L, 42L)).toDF("k", "m", "x")
    val r = Profile.concentration(df, Seq("k"), col("m"), col("x"))
      .collect().head
    assert(r.getDouble(3) === 0.0, "gini of one member is 0 by the formula")
    assert(r.getDouble(4) === 1.0)
  }

  test("equiDepthHistogram: uniform data splits evenly; skew stays balanced") {
    val uniform = (1L to 80L).map(v => Tuple1(v)).toDF("v")
    val got = Profile.equiDepthHistogram(uniform, col("v"), buckets = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got.values.map(_._1).toSeq.sorted === Seq(20L, 20L, 20L, 20L))
    assert(got(0L) === ((20L, 1L, 20L)) && got(3L) === ((20L, 61L, 80L)))
    // heavy skew: 90 copies of 1 plus 10 outliers — equi-WIDTH would
    // put ~all rows in one bucket; equi-depth collapses the duplicate
    // mass into the low buckets and still isolates the tail
    val skew = (Seq.fill(90)(1L) ++ (1000L to 1009L)).map(Tuple1(_)).toDF("v")
    val s = Profile.equiDepthHistogram(skew, col("v"), buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s.values.sum === 100L)
    assert(s(3L) === 10L, "the tail bucket isolates exactly the outliers")
  }

  test("equiDepthHistogramApprox: depth within the rank-error bound of the exact twin") {
    import org.apache.spark.sql.functions.col
    val n = 40000
    val rows = (0 until n).map(i => Tuple1((i * 2654435761L) % 100000L)).toDF("v")
    val accuracy = 1000
    val buckets = 8
    val got = Profile.equiDepthHistogramApprox(rows, col("v"), buckets, accuracy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.sum === n.toLong, "every row lands in exactly one bucket")
    // each boundary carries rank error ≤ n/accuracy; a bucket is bounded
    // by two boundaries, so its depth is n/B ± 2n/accuracy (+B slack for
    // the exact twin's own remainder spread)
    val target = n / buckets
    val tol = 2 * n / accuracy + buckets
    got.values.foreach(c =>
      assert(math.abs(c - target) <= tol, s"bucket depth $c vs target $target ± $tol"))
    // scale posture: the boundary aggregate is a mergeable approx summary
    val plan = Profile.equiDepthHistogramApprox(rows, col("v"), buckets, accuracy)
      .queryExecution.executedPlan.toString
    assert(plan.contains("percentile_approx"),
      s"expected approx-percentile boundaries, got:\n$plan")
  }

  private def catProf(rows: Seq[(String, String)]) =
    Profile.categoricalProfile(rows.toDF("dim", "v"), col("dim"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap

  test("categoricalProfile: mode ties break to the lexically smallest") {
    // b and a both appear twice: mode must be 'a', not shuffle-dependent
    val got = catProf(Seq("b", "a", "b", "a", "c").map("d" -> _))
    val (n, k, mode, mn, _, _) = got("d")
    assert((n, k, mode, mn) === ((5L, 3L, "a", 2L)))
  }

  test("categoricalProfile: entropy 0 for constant, 1 normalized for uniform") {
    val got = catProf(Seq("const" -> "x", "const" -> "x", "const" -> "x") ++
      Seq("unif" -> "p", "unif" -> "q", "unif" -> "r", "unif" -> "s"))
    val c = got("const")
    assert(c._5 === 0.0 && c._6 === None,
      "single-valued: zero entropy, undefined normalization")
    val u = got("unif")
    assert(u._6 === Some(1.0), "uniform over k values normalizes to exactly 1")
    val ln4r6 = BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(u._5 === ln4r6)
  }
}
