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

  test("maintainCounts: upsert retractions keep the mart == recompute; zeros leave") {
    val rnd = new scala.util.Random(11)
    var state = Map.empty[Long, String] // key -> current group
    var mart = Seq.empty[(String, Long)].toDF("g", "n_events")
    def recompute: Map[String, Long] =
      state.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def martMap: Map[String, Long] =
      mart.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 4).foreach { b =>
      // random upserts, last-wins within the batch (SCD-1 semantics);
      // a rewritten key MOVES between groups — the retraction case
      val batch = (0 until 120)
        .map(_ => (rnd.nextInt(60).toLong, s"grp${rnd.nextInt(5)}"))
        .groupBy(_._1).map { case (k, vs) => (k, vs.last._2) }.toSeq
      val removed = batch.flatMap { case (k, _) => state.get(k) }
      val added = batch.map(_._2)
      state = state ++ batch
      mart = Incremental.maintainCounts(mart,
        removed.toDF("g"), added.toDF("g"), Seq("g"))
      assert(martMap === recompute, s"batch $b diverged from recompute")
    }
    // drive every key into ONE group: all other groups hit zero and must
    // LEAVE the mart (absent == zero, or maintained != recomputed)
    val removedAll = state.values.toSeq
    val addedAll = Seq.fill(state.size)("grpX")
    state = state.map { case (k, _) => k -> "grpX" }
    mart = Incremental.maintainCounts(mart,
      removedAll.toDF("g"), addedAll.toDF("g"), Seq("g"))
    assert(martMap === Map("grpX" -> state.size.toLong))
  }

  test("patchPartitions: touched-partition recompute == full window recompute") {
    import org.apache.spark.sql.expressions.Window
    def view(base: DataFrame): DataFrame = base.withColumn("cum",
      sum(col("v")).over(Window.partitionBy("k").orderBy("t")))
    val base0 = (0 until 30).map(i => (s"k${i % 3}", i.toLong, (i * 7).toLong))
      .toDF("k", "t", "v")
    // the delta rewrites/extends ONLY partition k1
    val base1rows = (0 until 30).map { i =>
      val k = s"k${i % 3}"
      (k, i.toLong, if (k == "k1") (i * 11).toLong else (i * 7).toLong)
    } ++ Seq(("k1", 100L, 5L))
    val base1 = base1rows.toDF("k", "t", "v")
    val touched = Seq("k1").toDF("k")
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val patched = canon(Incremental.patchPartitions(view(base0),
      view(base1.join(touched, Seq("k"), "left_semi")), touched, Seq("k")))
    assert(patched === canon(view(base1)))
  }

  test("joinDelta: base-join ∪ delta == full join for ANY random split") {
    val as = (0 until 300).map(i => ((i * 13 % 40).toLong, i.toLong))
    val bs = (0 until 60).map(i => ((i % 40).toLong, s"b$i"))
    def dfA(s: Seq[(Long, Long)]) = s.toDF("k", "a")
    def dfB(s: Seq[(Long, String)]) = s.toDF("k", "b")
    val full = dfA(as).join(dfB(bs), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val (baseA, deltaA) = as.partition(_ => rnd.nextBoolean())
      val (baseB, deltaB) = bs.partition(_ => rnd.nextBoolean())
      val view = dfA(baseA).join(dfB(baseB), Seq("k"))
        .unionByName(Incremental.joinDelta(
          dfA(baseA), dfA(deltaA), dfB(baseB), dfB(deltaB), Seq("k")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(view === full, s"trial $trial diverged")
      // the ΔA ⋈ ΔB leg is load-bearing: dropping it loses exactly the
      // pairs where BOTH sides arrived in the delta
      val missingLeg = dfA(baseA).join(dfB(baseB), Seq("k"))
        .unionByName(dfA(deltaA).join(dfB(baseB), Seq("k")))
        .unionByName(dfA(baseA).join(dfB(deltaB), Seq("k")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val both = dfA(deltaA).join(dfB(deltaB), Seq("k"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(missingLeg === full -- both,
        "naive two-leg maintenance must lose exactly the delta-delta pairs")
    }
  }
}
