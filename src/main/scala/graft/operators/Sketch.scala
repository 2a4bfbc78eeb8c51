package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * KMV (k-minimum-values, "bottom-k") distinct-count sketch — the
 * mergeable-sketch family member the brief calls for, built from pure
 * DataFrame ops (no custom UDAF needed).
 *
 * Values hash to uniform (0,1); per group the k smallest distinct hash
 * positions are kept and the estimate is `(k-1) / u_k` (the classic KMV
 * estimator, RSE ≈ 1/√(k−2)). Groups with ≤ k distinct values are exact
 * by construction. At scale this is shuffle-light: the per-group state is
 * k values regardless of cardinality (the window's top-k prunes
 * map-side under AQE; a TypedImperativeAggregate drop-in could shrink it
 * further without changing the contract).
 */
object Sketch {

  def kmvDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                  k: Int = 256): DataFrame = {
    require(k >= 3, "KMV needs k >= 3")
    // hash → uniform (0,1); distinct per group first (KMV is over the set)
    val u = (xxhash64(col(valueCol)).cast("double") / lit(2.0)
      + lit(Long.MaxValue.toDouble / 2.0) + lit(1.0)) /
      lit(Long.MaxValue.toDouble + 2.0)
    val hashed = df.select((keys.map(col) :+ u.as("u")): _*).distinct()
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("u").asc)
    hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("u")).as("u_k"))
      .select((keys.map(col) :+
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise((lit(k - 1) / col("u_k")))
          .as("est_distinct")): _*)
  }
}
