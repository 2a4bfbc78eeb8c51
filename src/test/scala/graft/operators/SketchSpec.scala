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
    val est = Sketch.kmvDistinct(df, Seq("g"), "v", k = 512)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("small") === 40.0)
    assert(est("dups") === 7.0)
    val err = math.abs(est("big") - 5000.0) / 5000.0
    assert(err < 0.15, s"estimate ${est("big")} off by ${err * 100}%")
  }

  test("kmv estimate is invariant to duplication and row order") {
    val base = (0 until 3000).map(i => ("g", s"w$i"))
    val dup = base ++ base ++ base.reverse
    val e1 = Sketch.kmvDistinct(base.toDF("g", "v"), Seq("g"), "v", k = 256)
      .head().getDouble(1)
    val e2 = Sketch.kmvDistinct(dup.toDF("g", "v"), Seq("g"), "v", k = 256)
      .head().getDouble(1)
    assert(e1 === e2)
  }
}
