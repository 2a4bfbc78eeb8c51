package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Dense-vector math over `ArrayType(FloatType|DoubleType)` embedding
 * columns (reference README.md:72,116 — embeddings + top-K similarity), expressed with Spark higher-order functions (`zip_with` +
 * `aggregate`) so it runs inside Catalyst without UDF/serialization cost.
 *
 * All inputs are cast element-wise to DOUBLE *before* any arithmetic and
 * accumulated sequentially, which makes results bit-identical to an oracle
 * computing `list_dot_product(a::DOUBLE[], b::DOUBLE[])` the same way.
 */
object Vec {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity `dot/(|a|*|b|)`; NULL when either norm is 0.
    *
    * Dispatches to the native codegen'd
    * [[graft.functions.expressions.CosineSimilarity]] expression (one fused
    * loop, stays in whole-stage codegen — the HOF formulation is
    * interpreted and ~30× slower on pairwise workloads). Results are
    * bit-identical; [[cosineHof]] remains as the reference formulation. */
  def cosine(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    call_function("graft_cosine_sim", a, b)
  }

  /** Higher-order-function cosine (interpreted; kept as the executable
    * spec the native expression is cross-checked against). */
  def cosineHof(a: Column, b: Column): Column =
    F.safeDiv(dot(a, b), norm(a) * norm(b))

  /** Index (0-based, ascending-cid order) of the nearest centroid by
    * cosine — a scan-side projection via the native
    * [[graft.functions.expressions.NearestCentroid]] kernel: the IVF
    * assignment step with ZERO join/shuffle/window on the corpus. */
  def nearestCentroid(vec: Column, matrix: Seq[Seq[Double]]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    call_function("graft_nearest_centroid", vec, typedlit(matrix))
  }

  /** The `n` nearest centroid indices, ordered (cosine desc, index asc) —
    * the probe-side twin of [[nearestCentroid]]; `explode` for the probe
    * list with no per-query window. */
  def nearestCentroids(vec: Column, matrix: Seq[Seq[Double]], n: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    call_function("graft_nearest_centroids", vec, typedlit(matrix), lit(n))
  }

  /** Element-wise vector sum as a true mergeable aggregate (the k-means
    * Lloyd-update aggregate): per-group state is one dim-wide double
    * array, so the shuffle carries a single summed vector per
    * (group × partition) — see
    * [[graft.functions.expressions.VectorSum]]. */
  def vectorSum(vec: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    call_function("graft_vector_sum", vec)
  }

  /** Squared L2 distance (useful for IVF assignment without the sqrt). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x)
}
