package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Straightforward per-bit reference interleave. */
  private def refZ(a: Long, b: Long): Long = {
    val (x, y) = (a & 0x7FFFFFFFL, b & 0x7FFFFFFFL)
    (0 until 31).foldLeft(0L) { (z, i) =>
      z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }
  }

  test("zvalue matches the per-bit reference interleave") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (5L, 3L), (1L, 0L), (0L, 1L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (-1L, 42L), (1L << 40, 7L)) ++
      Seq.fill(50)((rnd.nextLong(), rnd.nextLong()))
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) === refZ(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // positivity: bit 61 is the highest settable bit
    assert(out.forall(_.getLong(2) >= 0L))
  }

  test("z-clustered layout narrows per-file ranges on BOTH dimensions") {
    // 40k rows over a 200 x 200 grid, arriving in time order (column b):
    // a naive time-sorted write gives every file the FULL span of a.
    val rows = spark.range(40000).select(
      (col("id") % 200).as("a"),
      (col("id") / 200).as("b"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString

    rows.repartitionByRange(16, col("b")).sortWithinPartitions(col("b"))
      .write.parquet(s"$base/by_time")
    ZOrder.cluster(rows, col("a"), col("b"), 16).write.parquet(s"$base/by_z")

    // mean per-file extent of each dimension, from the written files
    def extents(path: String): (Double, Double) = {
      val e = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("a") - min("a")).as("ea"), (max("b") - min("b")).as("eb"))
        .agg(avg("ea"), avg("eb")).head()
      (e.getDouble(0), e.getDouble(1))
    }
    val (timeA, timeB) = extents(s"$base/by_time")
    val (zA, zB) = extents(s"$base/by_z")
    // time-sorted: tight on b, useless on a (every file spans ~all of a),
    // so an a-filtered read prunes NOTHING
    assert(timeA > 150.0, s"expected full-a-span files, got $timeA")
    assert(timeB < 30.0, s"time layout should be tight on b, got $timeB")
    // z-clustered: BOTH dimensions' extents sit well below the full span
    // (measured 87 / 70 of 199 at 16 files) — min/max stats prune reads
    // filtered on EITHER column, the property a single-column sort lacks
    assert(zA < timeA / 2, s"z layout should narrow a: $zA vs $timeA")
    assert(zB < 100.0, s"z layout should keep b bounded: $zB")
    // and the layout is only a layout: same rows either way
    assert(spark.read.parquet(s"$base/by_z").count() === 40000)
  }

  test("declared q51 zvalue query runs against the events table") {
    val out = graft.SparkEntry.queries("q51_zorder")(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
    assert(out.agg(min("zvalue")).head().getLong(0) >= 0L)
  }

  test("zone map: odd bucketBits is rejected (per-dimension bound only holds for even splits)") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ZOrder.zoneMap(df, col("a"), col("b"), bucketBits = 9)
    }
  }

  test("zone map: every z-bucket fixes the top bits of BOTH normalized dimensions") {
    // narrow native domains on purpose (a < 3000, b = epoch-like offsets):
    // the normalization must spread them over the interleave domain — the
    // raw top z-bits of values like these are constant and would land
    // EVERY row in one bucket
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(5000)(
      (rnd.nextInt(3000).toLong, 1700000000L + rnd.nextInt(30000000).toLong))
    val zm = ZOrder.zoneMap(rows.toDF("a", "b"), col("a"), col("b"),
      bucketBits = 10).collect()
    assert(zm.length > 100, s"normalization should spread buckets, got ${zm.length}")
    assert(zm.map(_.getLong(1)).sum === 5000L)
    // subdivision property: 10 z-bits = 5 top bits per normalized dim, so
    // each bucket's rectangle is <= range/32 (+1 rounding) per side — the
    // bound stats-based pruning on EITHER predicate rests on
    def rng(sel: ((Long, Long)) => Long) = sel(rows.maxBy(sel)) - sel(rows.minBy(sel))
    val (ra, rb) = (rng(_._1), rng(_._2))
    zm.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= ra / 32 + 1,
        s"bucket ${r.getLong(0)} a-extent ${r.getLong(3) - r.getLong(2)}")
      assert(r.getLong(5) - r.getLong(4) <= rb / 32 + 1,
        s"bucket ${r.getLong(0)} b-extent ${r.getLong(5) - r.getLong(4)}")
    }
    // bit-agreement with a per-row reference: scale exactly as the
    // operator does (truncating div on non-negative longs), then refZ
    val (aMin, bMin) = (rows.map(_._1).min, rows.map(_._2).min)
    def sc(v: Long, mn: Long, range: Long): Long =
      (v - mn) * 2147483647L / math.max(range, 1L)
    val ref = rows.map { case (a, b) =>
        (refZ(sc(a, aMin, ra), sc(b, bMin, rb)) >>> 52, (a, b)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(zm.length === ref.size)
    zm.foreach { r =>
      val g = ref(r.getLong(0))
      assert(r.getLong(1) === g.size.toLong)
      assert(r.getLong(2) === g.map(_._1).min && r.getLong(3) === g.map(_._1).max)
      assert(r.getLong(4) === g.map(_._2).min && r.getLong(5) === g.map(_._2).max)
    }
  }
}
