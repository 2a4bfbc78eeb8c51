package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PatternsSpec extends SparkSpec {
  import spark.implicits._

  // (key, order, value) rows; tie = order (unique per key in these fixtures)
  private def run(rows: Seq[(String, Long, Double)], pattern: Seq[String]) =
    Patterns.matchRecognize(rows.toDF("k", "o", "v")
        .withColumn("dv", col("v") - lag(col("v"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("k")).orderBy(col("o")))),
      col("k"), col("o"), col("o"),
      Seq("down" -> (col("dv") < 0), "up" -> (col("dv") > 0)),
      pattern, col("v"))

  test("V pattern: maximal runs, measures, unmatched rows break adjacency") {
    // key a: 5 4 3 6 9 -> one V (down 2 rows, up 2 rows), then 9 9 (flat
    // breaks adjacency) 8 7 9 -> second V; key b: monotone rise -> none
    val rows = Seq[(String, Long, Double)](
      ("a", 1, 5), ("a", 2, 4), ("a", 3, 3), ("a", 4, 6), ("a", 5, 9),
      ("a", 6, 9), ("a", 7, 8), ("a", 8, 7), ("a", 9, 9),
      ("b", 1, 1), ("b", 2, 2), ("b", 3, 3))
    val out = run(rows, Seq("down", "up")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(8),
        r.getDouble(7))).sortBy(x => (x._1, x._2))
    // (key, match, o_start, o_end, down_rows, up_rows, v_start, v_min, v_end)
    // note column order: v_start, v_end, v_min, v_max -> indices 6,7,8,9
    assert(out.toSeq === Seq(
      ("a", 1L, 2L, 5L, 2L, 2L, 4.0, 3.0, 9.0),
      ("a", 2L, 7L, 9L, 2L, 1L, 8.0, 7.0, 9.0)))
    // the flat row (9 -> 9) classified by no symbol: it must BREAK the
    // up-run at o=5 from the down-run at o=7 — already evidenced by the
    // second match starting at o=7, not swallowing o=6
  }

  test("repeated-symbol pattern (W): greedy non-overlapping selection") {
    // zigzag of 8 alternating runs: D U D U D U D U (one row each).
    // W = down up down up; candidates start at runs 1,3,5; greedy keeps
    // 1 and 5 (3 overlaps the first match) — AFTER MATCH SKIP PAST LAST ROW
    val vals = Seq[Double](10, 9, 11, 8, 12, 7, 13, 6, 14)
    val rows = vals.zipWithIndex.map { case (v, i) => ("w", (i + 1).toLong, v) }
    val out = run(rows, Seq("down", "up", "down", "up")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // two matches: rows 1-5 (o_start=2 is the first delta row) and 5-9
    assert(out.length === 2, out.mkString(", "))
    assert(out(0) === ((1L, 2L, 5L)))
    assert(out(1) === ((2L, 6L, 9L)))
  }

  test("validation: unknown symbol, adjacent duplicates, duplicate defines") {
    val df = Seq(("a", 1L, 1.0)).toDF("k", "o", "v")
    val d = Seq("x" -> (col("v") > 0))
    intercept[IllegalArgumentException] {
      Patterns.matchRecognize(df, col("k"), col("o"), col("o"), d,
        Seq("x", "ghost"), col("v"))
    }
    intercept[IllegalArgumentException] {
      Patterns.matchRecognize(df, col("k"), col("o"), col("o"), d,
        Seq("x", "x"), col("v"))
    }
    intercept[IllegalArgumentException] {
      Patterns.matchRecognize(df, col("k"), col("o"), col("o"),
        Seq("x" -> (col("v") > 0), "x" -> (col("v") < 0)),
        Seq("x"), col("v"))
    }
  }

  test("first matching DEFINE wins; single-symbol pattern = maximal runs") {
    // both predicates true on every row: 'hi' shadows 'pos'
    val rows = Seq(("a", 1L, 5.0), ("a", 2L, 6.0), ("a", 3L, 7.0))
    val out = Patterns.matchRecognize(rows.toDF("k", "o", "v"),
        col("k"), col("o"), col("o"),
        Seq("hi" -> (col("v") > 0), "pos" -> (col("v") > 1)),
        Seq("hi"), col("v")).collect()
    assert(out.length === 1)
    assert(out.head.getLong(4) === 3L, "one maximal 3-row run")
  }

  test("plan: distinct-symbol pattern rides ONE exchange, no join") {
    val rows = (0 until 400).map(i =>
      (s"u${i % 7}", i.toLong, ((i * 37) % 11).toDouble))
    val plan = run(rows, Seq("down", "up"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges === 1, s"expected one shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"no join expected:\n$plan")
    // the repeated-symbol path adds the de-overlap fold + join back,
    // still keyed by k — candidates-sized data, never the rows
    val wPlan = run(rows, Seq("down", "up", "down", "up"))
      .queryExecution.executedPlan.toString
    assert(wPlan.toLowerCase.contains("join"))
  }
}
