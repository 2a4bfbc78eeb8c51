package graft.operators

import graft.SparkSpec

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
}
