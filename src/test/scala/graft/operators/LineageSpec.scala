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
}
