package graft.plans

import java.nio.file.Files

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  Graft.configure(spark) // attaches MvRewrite (idempotent)

  private def scans(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("exact-match aggregate rewrites to the mart scan; clear() restores base") {
    val base = Files.createTempDirectory("mv").toString
    (0 until 1000).map(i => (i % 7L, i.toDouble))
      .toDF("g", "x").write.parquet(s"$base/fact.parquet")
    def q() = spark.read.parquet(s"$base/fact.parquet")
      .groupBy("g").agg(sum($"x").as("sx"), count(lit(1)).as("n"))
    val expected = q().collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    try {
      MvCatalog.materialize(spark, "mv_agg", q(), s"$base/mv_agg_mart.parquet")
      val rewritten = q()
      assert(scans(rewritten).contains("mv_agg_mart.parquet"),
        s"expected mart scan:\n${scans(rewritten)}")
      assert(!scans(rewritten).contains("fact.parquet"),
        "base table must not be scanned after rewrite")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(got === expected)
    } finally MvCatalog.clear()
    // catalog cleared: same query reads the base again
    assert(scans(q()).contains("fact.parquet"))
  }

  test("subtree match under enclosing operators keeps attribute ids resolving") {
    val base = Files.createTempDirectory("mv_sub").toString
    (0 until 500).map(i => (i % 5L, i.toLong)).toDF("k", "v")
      .write.parquet(s"$base/t.parquet")
    def agg() = spark.read.parquet(s"$base/t.parquet")
      .groupBy("k").agg(sum($"v").as("sv"))
    try {
      MvCatalog.materialize(spark, "mv_sub", agg(), s"$base/mv_sub_mart.parquet")
      // the MV shape sits UNDER a filter + projection the MV knows
      // nothing about: rewrite must fire on the inner subtree and the
      // outer operators must still bind (exprIds preserved)
      val outer = agg().filter($"sv" > 100).select($"k", ($"sv" * 2).as("sv2"))
      assert(scans(outer).contains("mv_sub_mart.parquet"), scans(outer))
      val direct = spark.read.parquet(s"$base/t.parquet")
        .groupBy("k").agg(sum($"v").as("sv"))
        .filter($"sv" > 100).select($"k", ($"sv" * 2).as("sv2"))
      // compare against the un-rewritten result computed pre-registration
      assert(outer.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    } finally MvCatalog.clear()
  }

  test("non-matching plans are left alone; schema drift falls back to base") {
    val base = Files.createTempDirectory("mv_miss").toString
    (0 until 100).map(i => (i % 3L, i.toDouble)).toDF("g", "x")
      .write.parquet(s"$base/t.parquet")
    def q(lo: Double) = spark.read.parquet(s"$base/t.parquet")
      .filter($"x" >= lo).groupBy("g").agg(sum($"x").as("sx"))
    try {
      MvCatalog.materialize(spark, "mv_f", q(10.0), s"$base/mv_f_mart.parquet")
      // different filter constant: NOT an exact match, no rewrite
      assert(!scans(q(20.0)).contains("mv_f_mart.parquet"))
      assert(scans(q(10.0)).contains("mv_f_mart.parquet"))
      // schema drift: re-point the registration at a mart whose column
      // names no longer line up -> match aborts, base plan survives
      q(10.0).withColumnRenamed("sx", "other")
        .write.mode("overwrite").parquet(s"$base/mv_drift.parquet")
      MvCatalog.register(spark, "mv_f", q(10.0), s"$base/mv_drift.parquet")
      val fallback = q(10.0)
      assert(!scans(fallback).contains("mv_drift.parquet"))
      assert(fallback.count() === 3)
    } finally MvCatalog.clear()
  }

  test("rollup subsumption: subset keys and the grand total re-aggregate over the mart") {
    val base = Files.createTempDirectory("mv_cube").toString
    (0 until 2000).map(i => (i % 4L, i % 3L, i.toDouble))
      .toDF("k1", "k2", "x").write.parquet(s"$base/fact.parquet")
    def fact() = spark.read.parquet(s"$base/fact.parquet")
    def fine() = fact().groupBy("k1", "k2")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        min($"x").as("mn"), max($"x").as("mx"))
    def byK1() = fact().groupBy("k1")
      .agg(sum($"x").as("sx"), count(lit(1)).as("n"),
        min($"x").as("mn"), max($"x").as("mx"))
    def total() = fact().agg(sum($"x").as("sx"), count(lit(1)).as("n"))
    // ground truth computed BEFORE registration (no rewrite active)
    val wantK1 = byK1().collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    val wantTot = total().head()
    try {
      MvCatalog.materialize(spark, "mv_cube", fine(), s"$base/mv_cube_mart.parquet")
      val k1 = byK1()
      assert(scans(k1).contains("mv_cube_mart.parquet"),
        s"subset-key rollup must come from the mart:\n${scans(k1)}")
      assert(!scans(k1).contains("fact.parquet"))
      assert(k1.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet === wantK1)
      val tot = total()
      assert(scans(tot).contains("mv_cube_mart.parquet"),
        s"grand total must come from the mart:\n${scans(tot)}")
      assert(tot.head().getDouble(0) === wantTot.getDouble(0))
      assert(tot.head().getLong(1) === wantTot.getLong(1))
    } finally MvCatalog.clear()
  }

  test("rollup subsumption: scalar shells over aggregates rewrite too") {
    val base = Files.createTempDirectory("mv_cube_sc").toString
    (0 until 1200).map(i => (i % 4L, i % 3L, i.toDouble))
      .toDF("k1", "k2", "x").write.parquet(s"$base/fact.parquet")
    def fact() = spark.read.parquet(s"$base/fact.parquet")
    def fine() = fact().groupBy("k1", "k2")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"))
    // round() and a hand-written mean collapse INTO the aggregate during
    // optimization; only the aggregate leaves are substituted, so the
    // scalar shell rides along
    def q() = fact().groupBy("k1")
      .agg(round(sum($"x"), 2).as("rx"),
        (sum($"x") / count(lit(1))).as("mean_via_ratio"))
    val want = q().collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    try {
      MvCatalog.materialize(spark, "mv_sc", fine(), s"$base/mv_sc_mart.parquet")
      val rq = q()
      assert(scans(rq).contains("mv_sc_mart.parquet"), scans(rq))
      assert(rq.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet === want)
    } finally MvCatalog.clear()
  }

  test("rollup subsumption: decimal-cast money sums re-aggregate exactly") {
    // the moneySum discipline (r16): both the mart and the query sum
    // CAST(x AS DECIMAL(12,2)); the rewrite must map the query's
    // Sum(Cast(attr)) onto the mart's exact decimal partial sums —
    // keyed by the cast's target type — and the widened sum-of-sums
    // must flow through the round/cast-to-double shell to the SAME
    // double the base plan produces (exact, not round-absorbed)
    val base = Files.createTempDirectory("mv_dec").toString
    (0 until 3000).map(i => (i % 4L, i % 3L, (i % 700) + 0.17))
      .toDF("k1", "k2", "x").write.parquet(s"$base/fact.parquet")
    def fact() = spark.read.parquet(s"$base/fact.parquet")
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    def fine() = fact().groupBy("k1", "k2")
      .agg(count(lit(1)).as("n"), sum($"x".cast(dec)).as("total"))
    def q() = fact().groupBy("k1")
      .agg(round(sum($"x".cast(dec)), 2).cast("double").as("revenue"),
        round(sum($"x".cast(dec)).cast("double") / count(lit(1)), 2)
          .as("avg_v"))
    val want = q().collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    try {
      MvCatalog.materialize(spark, "mv_dec", fine(), s"$base/mv_dec_mart.parquet")
      val rq = q()
      assert(scans(rq).contains("mv_dec_mart.parquet"),
        s"decimal money sum must rollup-rewrite:\n${scans(rq)}")
      assert(!scans(rq).contains("fact.parquet"))
      assert(rq.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet === want)
      // a query whose cast TYPE differs from the mart's must NOT match
      // (the key carries the type: a dec(14,2) sum is a different agg)
      val other = fact().groupBy("k1")
        .agg(round(sum($"x".cast(org.apache.spark.sql.types.DecimalType(14, 2))), 2)
          .cast("double").as("revenue"))
      assert(!scans(other).contains("mv_dec_mart.parquet"),
        s"type-mismatched cast must keep the base plan:\n${scans(other)}")
    } finally MvCatalog.clear()
  }

  test("rollup subsumption: non-derivable shapes keep the base plan") {
    val base = Files.createTempDirectory("mv_cube_no").toString
    (0 until 300).map(i => (i % 4L, i % 3L, i.toDouble))
      .toDF("k1", "k2", "x").write.parquet(s"$base/fact.parquet")
    def fact() = spark.read.parquet(s"$base/fact.parquet")
    def fine() = fact().groupBy("k1", "k2")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"))
    try {
      MvCatalog.materialize(spark, "mv_no", fine(), s"$base/mv_no_mart.parquet")
      // avg does not re-aggregate from (n, sx) blindly — not exposed
      val avgQ = fact().groupBy("k1").agg(avg($"x").as("ax"))
      assert(!scans(avgQ).contains("mv_no_mart.parquet"))
      // distinct count is not derivable from a coarser mart
      val dQ = fact().groupBy("k1").agg(countDistinct($"x").as("d"))
      assert(!scans(dQ).contains("mv_no_mart.parquet"))
      // an extra base-side filter changes the child: no match
      val fQ = fact().filter($"x" > 100).groupBy("k1").agg(sum($"x").as("sx"))
      assert(!scans(fQ).contains("mv_no_mart.parquet"))
      // a key OUTSIDE the mart's group set: no match
      val xQ = fact().groupBy("x").agg(count(lit(1)).as("n"))
      assert(!scans(xQ).contains("mv_no_mart.parquet"))
    } finally MvCatalog.clear()
  }

  test("refresh: an overwritten mart is seen without re-registration") {
    val base = Files.createTempDirectory("mv_fresh").toString
    def writeBase(n: Int): Unit = (0 until n).map(i => (i % 2L, 1.0))
      .toDF("g", "x").write.mode("overwrite").parquet(s"$base/t.parquet")
    writeBase(100)
    def q() = spark.read.parquet(s"$base/t.parquet")
      .groupBy("g").agg(sum($"x").as("sx"))
    try {
      MvCatalog.materialize(spark, "mv_r", q(), s"$base/mv_r_mart.parquet")
      assert(q().agg(sum($"sx")).head().getDouble(0) === 100.0)
      // base grows; refresh = materialize again with a fresh definition
      // DataFrame — the name is removed before the write compiles, so
      // the refresh computes from the BASE, never from its own stale
      // mart (the self-referential refresh trap)
      writeBase(200)
      MvCatalog.materialize(spark, "mv_r", q(), s"$base/mv_r_mart.parquet")
      assert(q().agg(sum($"sx")).head().getDouble(0) === 200.0)
    } finally MvCatalog.clear()
  }
}
