package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv: exact for small groups, within estimator error for large ones") {
    val rows =
      (0 until 40).map(i => ("small", s"v$i")) ++                 // 40 distinct
      (0 until 20000).map(i => ("big", s"tok_${i % 5000}")) ++    // 5000 distinct
      (0 until 100).map(i => ("dups", s"x${i % 7}"))              // 7 distinct
    val df = rows.toDF("g", "v")
    val est = Sketch.kmvDistinct(df, Seq("g"), Sketch.shaLane(col("v")), k = 512)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("small") === 40.0)
    assert(est("dups") === 7.0)
    val err = math.abs(est("big") - 5000.0) / 5000.0
    assert(err < 0.15, s"estimate ${est("big")} off by ${err * 100}%")
  }

  test("misra-gries: exact heavy hitters on a known distribution") {
    // 1000 items: 'a' 300, 'b' 200, 'c' 100, 400 singletons.
    // k=9 -> threshold N/(k+1) = 100: heavy = {a, b} (c is NOT > 100).
    val items = (Seq.fill(300)("a") ++ Seq.fill(200)("b") ++ Seq.fill(100)("c") ++
      (0 until 400).map(i => s"s$i")).toDF("tok")
    val out = Sketch.heavyHitters(items, "tok", k = 9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 300L, "b" -> 200L))
  }

  test("misra-gries: result identical under different partitionings (mergeable)") {
    val items = ((0 until 5000).map(i => s"t${i % 37}") ++
      (0 until 3000).map(_ => "whale")).toDF("tok")
    val a = Sketch.heavyHitters(items.repartition(1), "tok", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sketch.heavyHitters(items.repartition(13), "tok", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a === b)
    assert(a.contains(("whale", 3000L)))
  }

  test("misra-gries summary: weights are lower bounds, no false negatives above N/(k+1)") {
    graft.functions.expressions.GraftExpressions.register(spark)
    val rows = (0 until 2000).map(i => s"w${i % 97}") ++ Seq.fill(500)("big")
    val items = rows.toDF("tok").repartition(7)
    val mg = items.agg(call_function("graft_misra_gries", col("tok"), lit(15)))
      .head().getMap[String, Long](0)
    val truth = rows.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
    val n = rows.size.toLong
    mg.foreach { case (item, w) =>
      assert(w <= truth(item), s"$item weight $w exceeds truth ${truth(item)}")
    }
    truth.filter(_._2 * 16 > n).keys.foreach { hh =>
      assert(mg.contains(hh), s"heavy item $hh missing from summary")
    }
  }

  test("kmv estimate is invariant to duplication and row order") {
    val base = (0 until 3000).map(i => ("g", s"w$i"))
    val dup = base ++ base ++ base.reverse
    val e1 = Sketch.kmvDistinct(base.toDF("g", "v"), Seq("g"), Sketch.shaLane(col("v")), k = 256)
      .head().getDouble(1)
    val e2 = Sketch.kmvDistinct(dup.toDF("g", "v"), Seq("g"), Sketch.shaLane(col("v")), k = 256)
      .head().getDouble(1)
    assert(e1 === e2)
  }

  test("kmv sketch aggregate matches the window-rank executable spec exactly") {
    val rows =
      (0 until 40).map(i => ("small", s"v$i")) ++
      (0 until 20000).map(i => ("big", s"tok_${i % 5000}")) ++
      (0 until 100).map(i => ("dups", s"x${i % 7}"))
    val df = rows.toDF("g", "v").repartition(7) // force multi-partition partials
    def toMap(r: Array[org.apache.spark.sql.Row]) =
      r.map(x => x.getString(0) -> x.getDouble(1)).toMap
    val win = toMap(Sketch.kmvDistinct(df, Seq("g"), Sketch.shaLane(col("v")), k = 256).collect())
    val agg = toMap(Sketch.kmvDistinctSketch(df, Seq("g"), Sketch.shaLane(col("v")), k = 256).collect())
    assert(win === agg)
  }

  test("kmv window spec ignores NULL lanes, matching the sketch aggregate") {
    // lane = NULL for every "nope" value; both formulations must ignore it
    val df = ((0 until 100).map(i => ("g", s"v${i % 40}")) ++
      (0 until 10).map(_ => ("g", "nope"))).toDF("g", "v")
    val lane = when(col("v") =!= "nope", Sketch.shaLane(col("v")))
    val win = Sketch.kmvDistinct(df, Seq("g"), lane, k = 16).head().getDouble(1)
    val agg = Sketch.kmvDistinctSketch(df, Seq("g"), lane, k = 16).head().getDouble(1)
    assert(win === agg)
  }

  test("kmv sketch works with the xxhash64 scale lane too") {
    val df = (0 until 5000).map(i => ("g", s"t${i % 1234}")).toDF("g", "v")
    val win = Sketch.kmvDistinct(df, Seq("g"), Sketch.xxLane(col("v")), k = 256).head().getDouble(1)
    val agg = Sketch.kmvDistinctSketch(df, Seq("g"), Sketch.xxLane(col("v")), k = 256).head().getDouble(1)
    assert(win === agg)
    assert(math.abs(win - 1234.0) / 1234.0 < 0.2)
  }

  test("kmv sketch plan aggregates partially (map-side combine, no window shuffle)") {
    val df = (0 until 1000).map(i => ("g" + (i % 3), s"v$i")).toDF("g", "v").repartition(4)
    val plan = Sketch.kmvDistinctSketch(df, Seq("g"), Sketch.shaLane(col("v")), k = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmv"),
      s"expected map-side partial KMV aggregation, got:\n$plan")
    assert(!plan.contains("Window"), s"no window shuffle expected, got:\n$plan")
  }

  test("hll: sketch aggregate matches the relational mirror") {
    val rows =
      (0 until 40).map(i => ("small", s"v$i")) ++
      (0 until 20000).map(i => ("big", s"tok_${i % 5000}")) ++
      (0 until 100).map(i => ("dups", s"x${i % 7}"))
    val df = rows.toDF("g", "v").repartition(7) // force multi-partition partials
    def toMap(r: Array[org.apache.spark.sql.Row]) =
      r.map(x => x.getString(0) -> x.getDouble(1)).toMap
    val win = toMap(Sketch.hllDistinct(df, Seq("g"), Sketch.shaLane(col("v")), p = 6).collect())
    val agg = toMap(Sketch.hllDistinctSketch(df, Seq("g"), Sketch.shaLane(col("v")), p = 6).collect())
    assert(win.keySet === agg.keySet)
    // both forms round(4); the double pipelines differ only in summation
    // order, so rounded values can straddle a boundary by at most 1 ulp
    win.keys.foreach(g =>
      assert(math.abs(win(g) - agg(g)) <= 0.00011, s"group $g: ${win(g)} vs ${agg(g)}"))
  }

  test("hll: estimates within error bounds at p=8") {
    val rows =
      (0 until 20000).map(i => ("big", s"tok_${i % 5000}")) ++
      (0 until 200).map(i => ("small", s"v${i % 40}"))
    val est = Sketch.hllDistinctSketch(rows.toDF("g", "v"), Seq("g"),
        Sketch.shaLane(col("v")), p = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // m=256 -> RSE ~ 6.5%; assert well inside 4 sigma
    assert(math.abs(est("big") - 5000.0) / 5000.0 < 0.25, s"big: ${est("big")}")
    // 40 distinct hits the small-range (linear counting) correction
    assert(math.abs(est("small") - 40.0) / 40.0 < 0.2, s"small: ${est("small")}")
  }

  test("hll: native aggregate is partition-invariant (mergeable registers)") {
    val rows = (0 until 8000).map(i => ("g", s"t${i % 3000}"))
    def run(parts: Int) = Sketch.hllDistinctSketch(
      rows.toDF("g", "v").repartition(parts), Seq("g"),
      Sketch.shaLane(col("v")), p = 6).head().getDouble(1)
    assert(run(1) === run(13))
  }

  test("hll: both forms ignore NULL lanes") {
    val df = ((0 until 100).map(i => ("g", s"v${i % 40}")) ++
      (0 until 10).map(_ => ("g", "nope"))).toDF("g", "v")
    val lane = when(col("v") =!= "nope", Sketch.shaLane(col("v")))
    val win = Sketch.hllDistinct(df, Seq("g"), lane, p = 6).head().getDouble(1)
    val agg = Sketch.hllDistinctSketch(df, Seq("g"), lane, p = 6).head().getDouble(1)
    assert(math.abs(win - agg) <= 0.00011)
    val noNull = Sketch.hllDistinctSketch(
      df.filter(col("v") =!= "nope"), Seq("g"), Sketch.shaLane(col("v")), p = 6)
      .head().getDouble(1)
    assert(agg === noNull)
  }

  test("hll plan aggregates partially (map-side combine, 2^p-byte state)") {
    val df = (0 until 1000).map(i => ("g" + (i % 3), s"v$i")).toDF("g", "v").repartition(4)
    val plan = Sketch.hllDistinctSketch(df, Seq("g"), Sketch.shaLane(col("v")), p = 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_hll"),
      s"expected map-side partial HLL aggregation, got:\n$plan")
    assert(!plan.contains("Window"), s"no window shuffle expected, got:\n$plan")
  }

  test("kmv overlap: exact on pairs whose union fits inside k") {
    val rows = (0 until 100).map(i => ("A", s"w$i")) ++
      (50 until 150).map(i => ("B", s"w$i"))
    val out = Sketch.kmvOverlap(rows.toDF("src", "v"), "src",
        Sketch.shaLane(col("v")), k = 256).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) === ("A", "B"))
    assert(r.getDouble(2) === 150.0)                     // est_union
    assert(r.getDouble(3) === math.rint(50.0 / 150.0 * 10000) / 10000) // est_jaccard
    assert(r.getDouble(4) === 50.0)                      // est_intersection
  }

  test("kmv overlap: estimates within tolerance on large overlapping sources") {
    val rows = (0 until 5000).map(i => ("A", s"t$i")) ++
      (2500 until 7500).map(i => ("B", s"t$i"))
    val r = Sketch.kmvOverlap(rows.toDF("src", "v").repartition(9), "src",
        Sketch.shaLane(col("v")), k = 256).head()
    val (union, jac, inter) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(math.abs(union - 7500.0) / 7500.0 < 0.25, s"union $union")
    assert(math.abs(jac - 1.0 / 3.0) < 0.12, s"jaccard $jac")
    assert(math.abs(inter - 2500.0) / 2500.0 < 0.35, s"intersection $inter")
  }

  test("kmv overlap: one row per unordered source pair") {
    val rows = (0 until 400).flatMap(i => Seq(
      (s"s${i % 4}", s"tok${i % 97}")))
    val out = Sketch.kmvOverlap(rows.toDF("src", "v"), "src",
        Sketch.shaLane(col("v")), k = 64)
      .select("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.length === 6) // C(4,2)
    out.foreach { case (a, b) => assert(a < b) }
  }

  test("kmv overlap: all-NULL-lane sources report exact zeros, never NaN") {
    val rows = (0 until 50).map(i => ("A", s"w$i")) ++
      Seq(("E", null: String), ("E", null: String), ("F", null: String))
    val out = Sketch.kmvOverlap(rows.toDF("src", "v"), "src",
        Sketch.shaLane(col("v")), k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.size === 3)
    // empty ∪ empty is exactly empty; empty vs non-empty overlaps nothing
    assert(out(("E", "F")) === ((0.0, 0.0, 0.0)))
    assert(out(("A", "E")) === ((50.0, 0.0, 0.0)))
    assert(out(("A", "F")) === ((50.0, 0.0, 0.0)))
    out.values.foreach { case (u, j, i) =>
      assert(!u.isNaN && !j.isNaN && !i.isNaN)
    }
  }

  test("quantiles: approx scale path within rank-error bound of the exact twin") {
    // deterministic skewed fixture: uniform 0..999 plus a heavy tail group
    val rows = (0 until 50000).map(i => ("uni", ((i * 2654435761L) % 1000).toDouble)) ++
      (0 until 5000).map(i => ("tail", math.pow(1.002, i % 4000)))
    val df = rows.toDF("g", "v")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    def byGroup(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = byGroup(Sketch.quantilesExact(df, Seq("g"), col("v"), ps))
    // accuracy=100 → rank error ≤ n/100; for the 50k uniform group that is
    // ≤500 ranks ≈ ≤10 in value over a 0..999 range (assert 5× slack)
    val approx = byGroup(Sketch.quantilesApprox(df, Seq("g"), col("v"), ps, accuracy = 100))
    for (g <- Seq("uni", "tail"); i <- 0 until 3) {
      val e = Seq(exact(g)._1, exact(g)._2, exact(g)._3)(i)
      val a = Seq(approx(g)._1, approx(g)._2, approx(g)._3)(i)
      // rank error ≤ n/accuracy = 1% of ranks; on the 1.002^i exponential
      // tail a 1%-rank shift is a 1.002^50 ≈ 10.5% value shift — bound at 12%
      val tol = math.max(50.0, e * 0.12)
      assert(math.abs(a - e) <= tol, s"group $g quantile $i: approx $a vs exact $e")
    }
    // at default accuracy the small-group summary is rank-lossless; the
    // two still differ by estimator (exact interpolates between ranks,
    // approx returns an actual data value) — so within one rank, not equal
    val small = (0 until 500).map(i => ("s", i.toDouble)).toDF("g", "v")
    val se = byGroup(Sketch.quantilesExact(small, Seq("g"), col("v"), ps))("s")
    val sa = byGroup(Sketch.quantilesApprox(small, Seq("g"), col("v"), ps))("s")
    for ((e, a) <- Seq(se._1 -> sa._1, se._2 -> sa._2, se._3 -> sa._3))
      assert(math.abs(a - e) <= 1.0, s"approx $a vs exact $e beyond one rank")
    // scale posture: the approx agg is a partial-merge hash aggregate, no
    // per-row sort/window, and the partial state is the bounded summary
    val plan = Sketch.quantilesApprox(df, Seq("g"), col("v"), ps)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_percentile_approx"),
      s"expected map-side partial approx-percentile, got:\n$plan")
  }

  test("cms: native sketch counters bit-equal the explode+groupBy twin, any partitioning") {
    val rows = (0 until 5000).map(i => s"tok_${i % 300}") ++
      Seq.fill(500)("hot") ++ (0 until 40).map(i => s"rare_$i")
    for (sha <- Seq(false, true); parts <- Seq(1, 13)) {
      val df = rows.toDF("v").repartition(parts)
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1)) -> r.getLong(2)
      val native = Sketch.cmsCounters(df, col("v"), d = 4, w = 64, sha = sha)
        .collect().map(key).toMap
      val twin = Sketch.cmsCountersSql(df, col("v"), d = 4, w = 64, sha = sha)
        .collect().map(key).toMap
      assert(native === twin, s"sha=$sha parts=$parts")
      // linear sketch: total mass per row == total input rows
      assert(native.collect { case ((j, _), c) if j == 0 => c }.sum === rows.size.toLong)
    }
  }

  test("cms estimates: never under the true count, exact when buckets are sparse") {
    val rows = Seq.fill(500)("hot") ++ Seq.fill(40)("warm") ++ Seq("cold")
    val df = rows.toDF("v")
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (sha <- Seq(false, true)) {
      // w >> distinct values: all three keys should estimate exactly
      val counters = Sketch.cmsCounters(df, col("v"), d = 4, w = 512, sha = sha)
      val est = Sketch.cmsEstimate(counters, df, col("v"), d = 4, w = 512, sha = sha)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est === exact, s"sha=$sha")
      // tight w forces collisions: estimates stay upper bounds
      val tight = Sketch.cmsCounters(df, col("v"), d = 2, w = 4, sha = sha)
      Sketch.cmsEstimate(tight, df, col("v"), d = 2, w = 4, sha = sha)
        .collect().foreach { r =>
          assert(r.getLong(1) >= exact(r.getString(0)), s"sha=$sha ${r.getString(0)}")
        }
    }
  }

  test("kmvTruncate: merge-truncate folding equals the one-shot k-minima exactly") {
    // the q210 maintained == rebuilt identity, as a property: fold three
    // arbitrary batches through truncate(state ∪ batch) and compare the
    // final state AND its estimate against the whole-set computation
    val k = 16
    val rows = (0 until 900).map(i => (s"g${i % 3}", s"tok_${i % 417}"))
      .toDF("g", "t").select(col("g"), Sketch.shaLane(col("t")).as("lane"))
    val oneShot = Sketch.kmvTruncate(rows, Seq("g"), k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    var state: org.apache.spark.sql.DataFrame = null
    (0 until 3).foreach { i =>
      val batch = (0 until 900).filter(_ % 3 == i)
        .map(j => (s"g${j % 3}", s"tok_${j % 417}"))
        .toDF("g", "t").select(col("g"), Sketch.shaLane(col("t")).as("lane"))
      val merged = if (state == null) batch else state.unionByName(batch)
      state = Sketch.kmvTruncate(merged, Seq("g"), k).localCheckpoint()
    }
    val folded = state.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(folded === oneShot, "k-minima must be exact under merge-truncate")
    // and the readout equals the window-rank batch estimator bit-for-bit
    val est = Sketch.kmvEstimateFromState(state, Seq("g"), k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batchEst = Sketch.kmvDistinct(rows, Seq("g"), col("lane"), k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est === batchEst)
  }

  test("kmvTruncate: aggregate form emits exactly the window-rank bottom-k rows") {
    // r16 rewired kmvTruncate from distinct+window to the KmvLanes
    // mergeable aggregate; this pins the row-set equality against the
    // window-rank spec (the old formulation, inlined) on a fixture with
    // heavy duplication, a group under k, and NULL lanes to ignore
    val k = 8
    val rows = ((0 until 600).map(i => (s"g${i % 2}", s"tok_${i % 97}")) ++
        (0 until 3).map(i => ("tiny", s"only_$i")))
      .toDF("g", "t")
      .select(col("g"),
        when(col("t") === "tok_13", lit(null).cast("long"))
          .otherwise(Sketch.shaLane(col("t"))).as("lane"))
    val got = Sketch.kmvTruncate(rows, Seq("g"), k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("g")).orderBy(col("lane").asc)
    val spec = rows.filter(col("lane").isNotNull).distinct()
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === spec)
  }
}
