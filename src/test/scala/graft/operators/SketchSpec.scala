package graft.operators

import graft.SparkSpec
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
}
