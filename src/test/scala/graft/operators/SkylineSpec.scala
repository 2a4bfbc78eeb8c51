package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline2: hand-checked frontier, ties on both dims co-exist") {
    // minimize x, maximize y
    val pts = Seq((1, 1, 1), (2, 1, 2), (3, 2, 3), (4, 2, 2), (5, 3, 3),
      (6, 3, 1), (7, 2, 3)).toDF("id", "x", "y")
    val sky = Skyline.skyline2(pts, col("x"), col("y"))
      .select("id").collect().map(_.getInt(0)).toSet
    // (1,2) beats (1,1); (2,3) beats (2,2), (3,3), (3,1); the duplicate
    // (2,3) point (id 7) ties id 3 on both dims — neither dominates
    assert(sky === Set(2, 3, 7))
  }

  test("skyline2: matches the O(n²) dominance definition on random data") {
    val rnd = new scala.util.Random(42)
    val pts = (0 until 400).map(i =>
      (i, rnd.nextInt(50), rnd.nextInt(50))).toDF("id", "x", "y")
    val got = Skyline.skyline2(pts, col("x"), col("y"))
      .select("id").collect().map(_.getInt(0)).toSet
    val raw = pts.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    val want = raw.filter { case (_, x, y) =>
      !raw.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.map(_._1).toSet
    assert(got === want)
  }

  test("skyline2: NULL dimensions are excluded, originals pass through") {
    val pts = Seq((1, Some(1), Some(5)), (2, None, Some(9)),
      (3, Some(0), None), (4, Some(2), Some(7))).toDF("id", "x", "y")
    val sky = Skyline.skyline2(pts, col("x"), col("y"))
    assert(sky.columns.toSeq === Seq("id", "x", "y"))
    assert(sky.select("id").collect().map(_.getInt(0)).toSet === Set(1, 4))
  }
}
