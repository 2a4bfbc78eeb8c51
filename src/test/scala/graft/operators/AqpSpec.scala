package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AqpSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(String, Long, String)] =
    (0 until 4000).map(i => (s"g${i % 3}", (i % 997).toLong + 10, s"k$i"))

  test("rate=1: estimators are exact and the error bar is zero") {
    val df = rows.toDF("g", "v", "id")
    val out = Aqp.sampledAggregate(df, Seq("g"), col("v"), 1.0,
        concat(lit("t|"), col("id")))
      .collect().map(r => r.getString(0) -> r).toMap
    val truth = rows.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    truth.foreach { case (g, (n, s)) =>
      assert(out(g).getLong(1) === n)          // n_s
      assert(out(g).getDouble(2) === n.toDouble) // n_est
      assert(out(g).getDouble(3) === s.toDouble) // sum_est
      assert(out(g).getDouble(4) === 0.0)        // se_sum
    }
  }

  test("quarter-rate estimates land within 4 standard errors of the truth") {
    val df = rows.toDF("g", "v", "id")
    val out = Aqp.sampledAggregate(df, Seq("g"), col("v"), 0.25,
      concat(lit("t|"), col("id"))).collect()
    assert(out.length === 3)
    val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    out.foreach { r =>
      val (g, est, se) = (r.getString(0), r.getDouble(3), r.getDouble(4))
      assert(se > 0.0)
      assert(math.abs(est - truth(g)) <= 4 * se,
        s"$g: est $est truth ${truth(g)} se $se")
    }
  }

  test("the sample is deterministic: same tag, same sample, any partitioning") {
    val df = rows.toDF("g", "v", "id")
    def run(parts: Int) = Aqp.sampledAggregate(df.repartition(parts), Seq("g"),
        col("v"), 0.25, concat(lit("t|"), col("id")))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(run(1) === run(11))
  }

  test("plan: the sample filter is scan-side; only the sample aggregates") {
    val plan = Aqp.sampledAggregate(rows.toDF("g", "v", "id"), Seq("g"),
        col("v"), 0.25, concat(lit("t|"), col("id")))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"))
    assert(plan.contains("partial"), "expected map-side partial aggregation")
    // on a local fixture Catalyst folds the deterministic hash filter into
    // the LocalTableScan itself (no Filter node); against a file source it
    // must sit below the aggregate — accept either, reject filter-on-top
    val fi = plan.indexOf("Filter")
    assert(fi == -1 || fi > plan.indexOf("HashAggregate"),
      s"filter should sit below the aggregate (scan-side):\n$plan")
  }
}
