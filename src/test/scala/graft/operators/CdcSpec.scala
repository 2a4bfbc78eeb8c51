package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val desc = Seq(col("seq").desc, col("id").desc)

  test("cdc merge: latest change wins, tombstoned keys drop out") {
    // k=1 updated twice; k=2 deleted last; k=3 deleted then re-inserted
    val log = Seq(
      (1L, "a", 1L, 10L, "U"), (1L, "b", 2L, 11L, "U"),
      (2L, "x", 1L, 12L, "U"), (2L, "x", 3L, 13L, "D"),
      (3L, "y", 1L, 14L, "D"), (3L, "z", 2L, 15L, "U")
    ).toDF("k", "state", "seq", "id", "op")
    val out = Cdc.merge(log, keys, desc, "op", "D")
      .select("k", "state").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "b", 3L -> "z"))
  }

  test("cdc merge: base-plus-delta equals one-shot fold (associativity)") {
    // deterministic synthetic log: 40 keys x 12 changes, op from a hash
    val log = spark.range(480).select(
      (col("id") % 40).as("k"),
      concat(lit("s"), (col("id") % 7).cast("string")).as("state"),
      (col("id") / 40).cast("long").as("seq"), col("id"),
      when(xxhash64(col("id")) % 5 === 0, lit("D")).otherwise(lit("U")).as("op"))
    val oneShot = Cdc.merge(log, keys, desc, "op", "D")
    val cut = 6L
    val base = Cdc.merge(log.filter(col("seq") < cut), keys, desc, "op", "D")
    val twoPhase = Cdc.merge(
      base.unionByName(log.filter(col("seq") >= cut)), keys, desc, "op", "D")
    assert(twoPhase.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(twoPhase).isEmpty)
  }

  test("scd2: consecutive equal states collapse into one interval, null-safely") {
    val log = Seq(
      // k=1: a,a,b,a -> 3 runs; k=2: null,null,c -> 2 runs (null is a state)
      (1L, Some("a"), 1L, 1L), (1L, Some("a"), 2L, 2L),
      (1L, Some("b"), 3L, 3L), (1L, Some("a"), 4L, 4L),
      (2L, None, 1L, 5L), (2L, None, 2L, 6L), (2L, Some("c"), 3L, 7L)
    ).toDF("k", "state", "seq", "id")
    val out = Cdc.scd2History(log, keys, "state",
        Seq(col("seq").asc, col("id").asc), col("seq"))
      .select("k", "state", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, Option[String], Long, Option[Long], Long, Boolean)]
      .collect().toSet
    assert(out === Set(
      (1L, Some("a"), 1L, Some(3L), 1L, false),
      (1L, Some("b"), 3L, Some(4L), 2L, false),
      (1L, Some("a"), 4L, None, 3L, true),
      (2L, None, 1L, Some(3L), 1L, false),
      (2L, Some("c"), 3L, None, 2L, true)))
  }

  test("scd2: intervals tile each key's timeline — no gaps, no overlaps") {
    val log = spark.range(300).select((col("id") % 20).as("k"),
      concat(lit("s"), (xxhash64(col("id")) % 4).cast("string")).as("state"),
      (col("id") / 20).cast("long").as("seq"), col("id"))
    val h = Cdc.scd2History(log, keys, "state",
      Seq(col("seq").asc, col("id").asc), col("seq"))
    // each interval's valid_to equals the next version's valid_from
    val rows = h.select("k", "valid_from", "valid_to", "version")
      .as[(Long, Long, Option[Long], Long)].collect()
      .groupBy(_._1).values
    rows.foreach { iv =>
      val byV = iv.sortBy(_._4)
      byV.sliding(2).foreach {
        case Array((_, _, to, _), (_, from, _, _)) => assert(to.contains(from))
        case _ =>
      }
      assert(byV.last._3.isEmpty && byV.init.forall(_._3.nonEmpty))
    }
  }
}
