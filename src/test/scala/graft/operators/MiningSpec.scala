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
}
