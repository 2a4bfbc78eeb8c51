package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineageSpec extends SparkSpec {
  import spark.implicits._

  test("sources: every base relation of a join plan, root paths not leaf files") {
    val base = Files.createTempDirectory("lineage").toString
    (0 until 10).map(i => (i.toLong, s"a$i")).toDF("k", "a")
      .repartition(3).write.parquet(s"$base/alpha.parquet")
    (0 until 10).map(i => (i.toLong, s"b$i")).toDF("k", "b")
      .write.parquet(s"$base/beta.parquet")
    val df = spark.read.parquet(s"$base/alpha.parquet")
      .join(spark.read.parquet(s"$base/beta.parquet"), Seq("k"))
      .filter(col("k") > 2).groupBy(col("a")).count()
    val srcs = Lineage.sources(df)
    assert(srcs.size === 2, srcs.mkString(", "))
    // root paths (the 3-file alpha table reports ONE identity), both found
    assert(srcs.count(_.endsWith("alpha.parquet")) === 1)
    assert(srcs.count(_.endsWith("beta.parquet")) === 1)
    assert(Lineage.sourceNames(df).sorted ===
      Seq("alpha.parquet", "beta.parquet"))
    // self-join: the same table twice is ONE lineage identity
    val self = spark.read.parquet(s"$base/alpha.parquet").as("l")
      .join(spark.read.parquet(s"$base/alpha.parquet").as("r"), Seq("k"))
    assert(Lineage.sourceNames(self) === Seq("alpha.parquet"))
  }

  test("report: (model, source) edge table; plan inspection executes nothing") {
    val base = Files.createTempDirectory("lineage_rep").toString
    Seq((1L, "x")).toDF("k", "v").write.parquet(s"$base/t1.parquet")
    Seq((1L, 2L)).toDF("k", "w").write.parquet(s"$base/t2.parquet")
    val m1 = spark.read.parquet(s"$base/t1.parquet")
    // a model that would THROW at execution (ANSI cast) still reports
    // lineage — the analyzed plan is the record, no execution happens
    val m2 = spark.read.parquet(s"$base/t1.parquet")
      .join(spark.read.parquet(s"$base/t2.parquet"), Seq("k"))
      .select(col("v").cast("long").as("boom"))
    val edges = Lineage.report(spark, Seq("m1" -> m1, "m2" -> m2))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges === Set(("m1", "t1.parquet"),
      ("m2", "t1.parquet"), ("m2", "t2.parquet")))
  }

  test("columnSources: alias chains, joins, aggregates resolve to leaf columns") {
    val base = Files.createTempDirectory("col_lineage").toString
    (0 until 8).map(i => (i.toLong, i * 2.0, i * 0.1)).toDF("k", "price", "disc")
      .write.parquet(s"$base/fact.parquet")
    (0 until 8).map(i => (i.toLong, s"n$i")).toDF("k", "name")
      .write.parquet(s"$base/dim.parquet")
    val df = spark.read.parquet(s"$base/fact.parquet")
      .join(spark.read.parquet(s"$base/dim.parquet"), Seq("k"))
      .filter(col("price") > 0) // filter predicates must NOT leak into lineage
      .groupBy(col("name"))
      .agg(
        sum(col("price") * (lit(1.0) - col("disc"))).as("rev"),
        count(lit(1)).as("n"))
    val cs = Lineage.columnSources(df)
    assert(cs("name") === Set("dim.parquet" -> "name"))
    assert(cs("rev") ===
      Set("fact.parquet" -> "price", "fact.parquet" -> "disc"))
    // literal-only column: no base source (join key k stays out of all)
    assert(cs("n") === Set.empty)
  }

  test("columnSources: union merges positionally; window keeps its keys") {
    val base = Files.createTempDirectory("col_lineage_u").toString
    Seq((1L, 10.0)).toDF("k", "a").write.parquet(s"$base/u1.parquet")
    Seq((2L, 20.0)).toDF("k", "b").write.parquet(s"$base/u2.parquet")
    val u = spark.read.parquet(s"$base/u1.parquet").select(col("a").as("v"))
      .union(spark.read.parquet(s"$base/u2.parquet").select(col("b").as("v")))
    assert(Lineage.columnSources(u)("v") ===
      Set("u1.parquet" -> "a", "u2.parquet" -> "b"))
    // window value derivation includes partition/order keys (the frame
    // changes the value); the un-windowed passthrough does not
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("a")
    val df = spark.read.parquet(s"$base/u1.parquet")
      .select(col("a"), sum(col("a")).over(w).as("run"))
    val cs = Lineage.columnSources(df)
    assert(cs("run") === Set("u1.parquet" -> "a", "u1.parquet" -> "k"))
    assert(cs("a") === Set("u1.parquet" -> "a"))
  }

  test("columnSources: exploded columns derive from the generator input") {
    val base = Files.createTempDirectory("col_lineage_g").toString
    Seq((1L, Seq("x", "y"))).toDF("k", "arr").write.parquet(s"$base/g.parquet")
    val df = spark.read.parquet(s"$base/g.parquet")
      .select(col("k"), explode(col("arr")).as("item"))
    val cs = Lineage.columnSources(df)
    assert(cs("item") === Set("g.parquet" -> "arr"))
    assert(cs("k") === Set("g.parquet" -> "k"))
  }
}
