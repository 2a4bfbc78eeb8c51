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

  private def kappa(rows: Seq[(String, String)]) = {
    val r = Experiment.cohensKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("cohensKappa: the textbook 2x2 (20/15 agree, 10/5 disagree) = 0.4") {
    // po = 35/50 = 0.7; pe = (30*25 + 20*25)/2500 = 0.5; kappa = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(10)(("yes", "no")) ++ Seq.fill(5)(("no", "yes"))
    assert(kappa(rows) === ((50L, 35L, 0.7, 0.5, Some(0.4))))
  }

  test("cohensKappa: perfect agreement = 1; exact independence = 0") {
    val perfect = Seq.fill(7)(("x", "x")) ++ Seq.fill(3)(("y", "y"))
    assert(kappa(perfect)._5 === Some(1.0))
    // balanced independent raters: po = pe = 0.5 -> kappa exactly 0
    val indep = (for { a <- Seq("x", "y"); b <- Seq("x", "y"); _ <- 1 to 5 }
      yield (a, b))
    val (_, _, po, pe, k) = kappa(indep)
    assert(po === 0.5 && pe === 0.5 && k === Some(0.0))
  }

  test("cohensKappa: two constant raters make pe = 1 -> NULL, not NaN") {
    assert(kappa(Seq.fill(5)(("x", "x")))._5 === None)
    // constant but DISAGREEING raters: po = 0, pe = 0 on the diagonal
    // (no matching label), kappa = 0 well-defined
    val (_, agree, po, pe, k) = kappa(Seq.fill(5)(("x", "y")))
    assert(agree === 0L && po === 0.0 && pe === 0.0 && k === Some(0.0))
  }
}
