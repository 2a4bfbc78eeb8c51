package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MiningSpec extends SparkSpec {
  import spark.implicits._

  private val baskets = Seq(
    1 -> "a", 1 -> "b", 1 -> "c",
    2 -> "a", 2 -> "b",
    3 -> "a", 3 -> "c",
    4 -> "b", 4 -> "c",
    5 -> "a", 5 -> "b").toDF("basket", "item")

  test("associationRules: hand-checked supports, confidence and lift") {
    // n=5 baskets; counts a=4 b=4 c=3; pairs ab=3 ac=2 bc=2; minSup=2
    val rules = Mining.associationRules(baskets, col("basket"), col("item"), 0.4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8))).toMap
    assert(rules.size === 6, "three pairs, both directions")
    val ab = rules(("a", "b"))
    assert(ab === ((5L, 4L, 4L, 3L, 3.0 / 5.0, 3.0 / 4.0, 5.0 * 3 / (4.0 * 4))))
    val ba = rules(("b", "a"))
    assert(ba._5 === 3.0 / 5.0)
    assert(ba._6 === 3.0 / 4.0)
    val ca = rules(("c", "a"))
    assert(ca === ((5L, 3L, 4L, 2L, 2.0 / 5.0, 2.0 / 3.0, 5.0 * 2 / (3.0 * 4))))
  }

  test("associationRules: duplicate items in a basket count once") {
    val dup = baskets.unionAll(Seq(1 -> "a", 1 -> "a").toDF("basket", "item"))
    val a = Mining.associationRules(dup, col("basket"), col("item"), 0.4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5))).toSet
    val b = Mining.associationRules(baskets, col("basket"), col("item"), 0.4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5))).toSet
    assert(a === b)
  }

  test("associationRules: Apriori prune removes infrequent items and pairs") {
    // 'd' occurs once (below minSup=3): no rule may mention it; at
    // rate 0.6 → minSup=3 only the ab pair (3 baskets) survives
    val withD = baskets.unionAll(Seq(1 -> "d").toDF("basket", "item"))
    val rules = Mining.associationRules(withD, col("basket"), col("item"), 0.6)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rules.toSet === Set("a" -> "b", "b" -> "a"))
  }

  test("associationRules: invalid support rates rejected") {
    intercept[IllegalArgumentException] {
      Mining.associationRules(baskets, col("basket"), col("item"), 0.0)
    }
    intercept[IllegalArgumentException] {
      Mining.associationRules(baskets, col("basket"), col("item"), 1.5)
    }
  }

  private def seqRules(rows: Seq[(Int, Long, Long, String)],
                       minPairs: Long = 1L) =
    Mining.sequentialRules(rows.toDF("k", "o", "tie", "sym"),
        col("k"), col("o"), col("tie"), col("sym"), minPairs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("sequentialRules: adjacency is order-aware, last event predicts nothing") {
    // key 1: a b a c ; key 2: a b
    val rows = Seq((1, 1L, 1L, "a"), (1, 2L, 2L, "b"), (1, 3L, 3L, "a"),
      (1, 4L, 4L, "c"), (2, 1L, 1L, "a"), (2, 2L, 2L, "b"))
    val got = seqRules(rows)
    // antecedent totals: a has 3 successor slots (two in key1, one in key2);
    // b has ONE — key 2's b is last and predicts nothing; c none
    assert(got === Map(
      ("a", "b") -> ((2L, 3L, 2.0 / 3.0)),
      ("a", "c") -> ((1L, 3L, 1.0 / 3.0)),
      ("b", "a") -> ((1L, 1L, 1.0))))
    assert(!got.keySet.exists(_._1 == "c"), "a final event is no antecedent")
  }

  test("sequentialRules: ties on order resolve by the tie-break column") {
    // both at o=1: tie decides a→b (not b→a)
    val rows = Seq((1, 1L, 1L, "a"), (1, 1L, 2L, "b"), (1, 2L, 3L, "c"))
    val got = seqRules(rows)
    assert(got.contains(("a", "b")) && got.contains(("b", "c")))
    assert(!got.contains(("b", "a")))
  }

  test("sequentialRules: minPairs filters pairs but denominators keep all slots") {
    val rows = Seq((1, 1L, 1L, "a"), (1, 2L, 2L, "b"), (1, 3L, 3L, "a"),
      (1, 4L, 4L, "b"), (1, 5L, 5L, "a"), (1, 6L, 6L, "c"))
    val got = seqRules(rows, minPairs = 2L)
    // a→b twice (kept), a→c once and b→a twice... b→a occurs twice: kept
    assert(got(("a", "b")) === ((2L, 3L, 2.0 / 3.0)),
      "n_ante counts ALL of a's successor slots, including the filtered a→c")
    assert(!got.contains(("a", "c")))
  }
}
