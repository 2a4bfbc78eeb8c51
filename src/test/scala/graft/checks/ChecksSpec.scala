package graft.checks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some("a"), Some("x"), 1),
    (Some("a"), Some("y"), 0),
    (None, Some("z"), 5),
    (Some("b"), None, 2)).toDF("k", "v", "n")

  test("notNull reports NULL rows, optionally scoped") {
    assert(Checks.notNull(df, "k").count() === 1)
    assert(Checks.notNull(df, "v", col("n") > 2).count() === 0)
    assert(Checks.notNull(df, "v", col("n") >= 2).count() === 1)
  }

  test("unique reports duplicated keys once each") {
    val fails = Checks.unique(df, "k").collect()
    assert(fails.length === 1)
    assert(fails.head.getString(0) === "a")
  }

  test("acceptedValues passes NULLs (dbt semantics), fails strangers") {
    assert(Checks.acceptedValues(df, "v", Seq("x", "y", "z")).count() === 0)
    assert(Checks.acceptedValues(df, "v", Seq("x")).count() === 2)
  }

  test("relationships: orphaned children fail, NULL FKs pass") {
    val parent = Seq("x", "y").toDF("pk")
    val fails = Checks.relationships(df, "v", parent, "pk").collect()
    assert(fails.map(_.getAs[String]("v")).toSet === Set("z"))
  }
}
