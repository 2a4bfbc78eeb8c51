package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A/B readout: unit collapse, Wilson interval properties, edge rates. */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Boolean)]) =
    Experiment.abTest(rows.toDF("u", "variant", "c"),
        col("u"), col("variant"), col("c"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap

  test("abTest: a unit converts once no matter how many converting events") {
    val rows = Seq((1L, "A", true), (1L, "A", true), (1L, "A", false),
      (2L, "A", false), (3L, "B", true), (4L, "B", false))
    val got = run(rows)
    assert(got("A")._1 === 2L && got("A")._2 === 1L && got("A")._3 === 0.5)
    assert(got("B")._1 === 2L && got("B")._2 === 1L && got("B")._3 === 0.5)
  }

  test("abTest: Wilson bounds bracket the rate and stay inside [0, 1]") {
    val rows = (1L to 50L).map(u => (u, "A", u <= 43)) ++
      (51L to 60L).map(u => (u, "B", u <= 51))
    val got = run(rows)
    got.foreach { case (v, (_, _, p, lo, hi)) =>
      assert(lo < p && p < hi, s"$v: $lo < $p < $hi")
      assert(lo >= 0.0 && hi <= 1.0, s"$v inside the unit interval: $lo, $hi")
    }
    // the smaller sample has the wider interval at a comparable rate
    val (_, _, _, la, ha) = got("A")
    val (_, _, _, lb, hb) = got("B")
    assert(hb - lb > ha - la, "n=10 is less certain than n=50")
  }

  test("abTest: extreme rates keep nonzero width (the Wald 0-width failure)") {
    val rows = (1L to 20L).map(u => (u, "all", true)) ++
      (21L to 40L).map(u => (u, "none", false))
    val got = run(rows)
    val all = got("all"); val none = got("none")
    assert(all._3 === 1.0 && all._4 < 1.0 && all._5 === 1.0,
      "p=1: Wilson lower bound pulls below 1, Wald would sit at exactly 1")
    assert(none._3 === 0.0 && none._4 === 0.0 && none._5 > 0.0)
  }

  test("abTest: hand-checked Wilson numbers (z = 1.96, n = 10, x = 5)") {
    val rows = (1L to 10L).map(u => (u, "A", u <= 5))
    val (_, _, p, lo, hi) = run(rows)("A")
    assert(p === 0.5)
    // standard textbook values for 5/10: [0.2366, 0.7634] at 4dp
    assert(math.abs(lo - 0.2366) < 5e-4, s"lo $lo")
    assert(math.abs(hi - 0.7634) < 5e-4, s"hi $hi")
  }
}
