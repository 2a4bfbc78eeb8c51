package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")

  private def facts(rows: Seq[(String, Long)]): DataFrame = rows.toDF("g", "v")

  private def agg(df: DataFrame) =
    Incremental.aggregate(df, keys, Seq("v"), mins = Seq("v"), maxs = Seq("v"))

  private def canon(df: DataFrame): Set[(String, Long, Long, Long, Long)] =
    df.select("g", "sum_v", "min_v", "max_v", "n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  private val rows: Seq[(String, Long)] =
    (0 until 500).map(i => (s"g${i % 7}", (i * 37 % 1000).toLong - 300))

  test("merge(agg(A), agg(B)) == agg(A ∪ B) for any split point") {
    val full = canon(agg(facts(rows)))
    Seq(0, 1, 123, 250, 499, 500).foreach { cut =>
      val (a, b) = rows.splitAt(cut)
      val merged = Incremental.mergeAggregates(
        Seq(agg(facts(a)), agg(facts(b))), keys, Seq("v"),
        mins = Seq("v"), maxs = Seq("v"))
      assert(canon(merged) === full, s"split at $cut diverged")
    }
  }

  test("multi-way merge and idempotent re-entry (tonight's mart is tomorrow's base)") {
    val full = canon(agg(facts(rows)))
    val parts = rows.grouped(97).map(p => agg(facts(p))).toSeq
    val multi = Incremental.mergeAggregates(parts, keys, Seq("v"),
      mins = Seq("v"), maxs = Seq("v"))
    assert(canon(multi) === full)
    // fold one more delta into the ALREADY-MERGED mart: same schema in,
    // same schema out, still equal to the flat recompute
    val extra = (0 until 50).map(i => (s"g${i % 3}", 5000L + i))
    val reentered = Incremental.mergeAggregates(
      Seq(multi, agg(facts(extra))), keys, Seq("v"),
      mins = Seq("v"), maxs = Seq("v"))
    assert(canon(reentered) === canon(agg(facts(rows ++ extra))))
  }

  test("delta keys absent from the base (and vice versa) survive the merge") {
    val base = facts(Seq(("only_base", 1L), ("shared", 2L)))
    val delta = facts(Seq(("only_delta", 3L), ("shared", 4L)))
    val merged = canon(Incremental.mergeAggregates(
      Seq(agg(base), agg(delta)), keys, Seq("v"),
      mins = Seq("v"), maxs = Seq("v")))
    assert(merged === Set(
      ("only_base", 1L, 1L, 1L, 1L),
      ("only_delta", 3L, 3L, 3L, 1L),
      ("shared", 6L, 2L, 4L, 2L)))
  }

  test("merge plan: one aggregate over the union, map-side partials, no join") {
    val a = agg(facts(rows.take(250)).repartition(4))
    val b = agg(facts(rows.drop(250)).repartition(4))
    val plan = Incremental.mergeAggregates(Seq(a, b), keys, Seq("v"),
      mins = Seq("v"), maxs = Seq("v")).queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), s"expected map-side partial sums, got:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"no join expected, got:\n$plan")
  }
}
