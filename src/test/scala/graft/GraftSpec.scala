package graft

class GraftSpec extends SparkSpec {

  test("configure registers native functions for plain SQL") {
    Graft.configure(spark)
    val cos = spark.sql(
      "SELECT graft_cosine_sim(array(1.0D, 0.0D), array(1.0D, 1.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0 / math.sqrt(2.0)) < 1e-15)
    val sh = spark.sql(
      "SELECT graft_shingles(array('a','b','c'), 2) AS s")
      .head().getSeq[String](0)
    assert(sh === Seq("a b", "b c"))
  }

  test("configure respects an explicitly non-ANSI host session; zoneMap refuses it") {
    // the configure contract (scaladoc): graft never flips a host's own
    // ANSI choice — the overflow guard lives in the operator that needs
    // it, which must fail loudly up front rather than wrap silently
    val saved = spark.conf.get("spark.sql.ansi.enabled", "true")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      Graft.configure(spark)
      assert(spark.conf.get("spark.sql.ansi.enabled") === "false",
        "configure must not override an explicit host ANSI=false")
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val df = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
      val e = intercept[IllegalArgumentException] {
        graft.functions.ZOrder.zoneMap(df, col("a"), col("b"), bucketBits = 4)
      }
      assert(e.getMessage.contains("ansi"))
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", saved)
      Graft.configure(spark)
    }
    // and on an ANSI session the same call plans fine
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ok = graft.functions.ZOrder.zoneMap(
      Seq((1L, 2L), (3L, 4L)).toDF("a", "b"), col("a"), col("b"), bucketBits = 4)
    assert(ok.collect().nonEmpty)
  }

  test("registerTables exposes the full testdata surface to spark.sql") {
    Graft.configure(spark)
    Graft.registerTables(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin)
      .head().getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT max(ts) FROM events").head().get(0) != null)
  }
}
