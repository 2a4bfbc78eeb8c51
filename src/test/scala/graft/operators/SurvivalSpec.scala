package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kaplan–Meier: textbook curve, censoring semantics, risk-set edges. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def km(rows: Seq[(String, Long, Long)]) =
    Survival.kaplanMeier(rows.toDF("g", "t", "e"), Seq("g"), col("t"),
        col("e"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("kaplanMeier: the classic 6-subject textbook example") {
    // events at t=1,3,5; censored at t=2,4,6
    val rows = Seq(("a", 1L, 1L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("a", 4L, 0L), ("a", 5L, 1L), ("a", 6L, 0L))
    val got = km(rows)
    // t=1: d=1 n=6 → 5/6; t=3: d=1 n=4 → 5/6·3/4; t=5: d=1 n=2 → ·1/2
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet === Set(("a", 1L), ("a", 3L), ("a", 5L)),
      "curve rows only at event times, not censoring times")
    assert(got(("a", 1L)) === ((1L, 6L, r6(5.0 / 6))))
    assert(got(("a", 3L)) === ((1L, 4L, r6(5.0 / 6 * 3 / 4))))
    assert(got(("a", 5L)) === ((1L, 2L, r6(5.0 / 6 * 3 / 4 / 2))))
  }

  test("kaplanMeier: all-censored group emits no steps; no-censoring equals ECDF") {
    val rows = Seq(("cens", 1L, 0L), ("cens", 2L, 0L)) ++
      Seq(("full", 1L, 1L), ("full", 1L, 1L), ("full", 2L, 1L),
        ("full", 3L, 1L))
    val got = km(rows)
    assert(!got.keySet.exists(_._1 == "cens"))
    // without censoring KM is the empirical survivor function: 2/4, 1/4, 0
    assert(got(("full", 1L)) === ((2L, 4L, 0.5)))
    assert(got(("full", 2L)) === ((1L, 2L, 0.25)))
    assert(got(("full", 3L))._3 === 0.0,
      "whole-risk-set event pins survival to exactly 0 (no ln(0) path)")
  }

  test("kaplanMeier: simultaneous events and censorings share the risk set") {
    // at t=2: 2 events + 1 censoring out of 4 at risk
    val rows = Seq(("g", 2L, 1L), ("g", 2L, 1L), ("g", 2L, 0L),
      ("g", 5L, 0L))
    val got = km(rows)
    assert(got === Map(("g", 2L) -> ((2L, 4L, 0.5))))
  }
}
