package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Scan-side IVF assignment: the index of the nearest centroid (by cosine)
 * of an embedding, computed as a pure projection — the centroid matrix
 * rides along as a codegen reference object, so the corpus is NEVER
 * joined, shuffled, or windowed to get its cluster id (the vector-search
 * analog of partition pruning; reference README.md:72,116 k-NN surface).
 *
 * Replaces the `crossJoin(broadcast(centroids))` + per-id window argmax,
 * which materializes |corpus| × |centroids| rows and hash-shuffles them
 * per assignment/(re)build — at 100 TB with a realistic 4k–65k centroid
 * set, that shuffle was the plan's biggest scale cost.
 *
 * Semantics are bit-identical to the window form
 * (`row_number over (order by cosine desc, cid asc) = 1`, centroids in
 * ascending-cid order = ascending index):
 *  - cosine per [[CosineSimilarity]]: widen-first, sequential accumulation;
 *  - argmax by strict `>` over ascending index ≡ ties keep the smallest;
 *  - a centroid with undefined cosine (zero norm / length mismatch) is
 *    never a candidate, matching NULLS LAST under a DESC ordering;
 *  - if NO centroid has a defined cosine the result is index 0 — exactly
 *    the `cid asc` order the window falls back to;
 *  - NULL input → NULL (the window form has no principled answer there;
 *    operators drop NULL embeddings before assignment).
 */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects (array<float|double>, non-empty centroid " +
        s"matrix), got ${other.catalogString} with ${centroids.size} centroids")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    NearestCentroidUtil.nearest(input.asInstanceOf[ArrayData], matrix, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the matrix enters generated code as a reference object, so the
    // source text is byte-identical across centroid sets (Janino cache)
    val m = ctx.addReferenceObj("centMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NearestCentroidUtil$$.MODULE$$.nearest($c, $m, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/**
 * Top-`n` variant for the query/probe side: the `n` nearest centroid
 * indices ordered by (cosine desc, index asc) — `explode` it to get the
 * probe list without any per-query window, so probing stays a projection
 * even when "queries" is itself a 100 TB corpus (all-pairs ANN).
 * Undefined-cosine centroids fill trailing slots in ascending-index order,
 * exactly like NULLS LAST rows under the window form's `rk <= n`.
 */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]], n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if centroids.nonEmpty && n >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroids expects (array<float|double>, non-empty centroid " +
        s"matrix, n >= 1), got ${other.catalogString} with ${centroids.size} " +
        s"centroids, n=$n")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_nearest_centroids"

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    NearestCentroidUtil.top(input.asInstanceOf[ArrayData], matrix, isFloat, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NearestCentroidUtil$$.MODULE$$.top($c, $m, $isFloat, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** Compiled nearest-centroid kernels shared by interpreted eval and
  * generated code. Cosine accumulation is bit-identical to
  * [[CosineSimilarity]] (widen float→double first, sequential); an
  * undefined cosine is signalled as NaN internally and never compared. */
object NearestCentroidUtil {

  /** Cosine of (vec, centroid), NaN when undefined (length mismatch, NULL
    * element, zero norm) — same cases [[CosineSimilarity]] returns NULL. */
  private def cosine(x: ArrayData, y: Array[Double], float: Boolean): Double = {
    val n = x.numElements()
    if (n != y.length) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return Double.NaN
      val xv = if (float) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = y(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) Double.NaN else dot / den
  }

  def nearest(vec: ArrayData, matrix: Array[Array[Double]], float: Boolean): Int = {
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var found = false
    var i = 0
    while (i < matrix.length) {
      val c = cosine(vec, matrix(i), float)
      // strict > over ascending i ≡ ties keep the smallest index;
      // NaN (undefined) never wins a comparison and is skipped explicitly
      if (!c.isNaN && (!found || c > best)) { best = c; bestIdx = i; found = true }
      i += 1
    }
    bestIdx
  }

  def top(vec: ArrayData, matrix: Array[Array[Double]], float: Boolean,
          n: Int): ArrayData = {
    val k = matrix.length
    val keep = math.min(n, k)
    val idx = new Array[Int](keep)
    val cos = new Array[Double](keep)
    var used = 0
    var i = 0
    while (i < k) {
      val c = cosine(vec, matrix(i), float)
      if (!c.isNaN) {
        // insertion position: after every kept entry with cos >= c (ties
        // keep the earlier index, which is always the already-kept one)
        var p = used
        while (p > 0 && cos(p - 1) < c) p -= 1
        if (p < keep) {
          val last = math.min(used, keep - 1)
          var j = last
          while (j > p) { idx(j) = idx(j - 1); cos(j) = cos(j - 1); j -= 1 }
          idx(p) = i; cos(p) = c
          if (used < keep) used += 1
        }
      }
      i += 1
    }
    // undefined-cosine centroids fill trailing slots in ascending-index
    // order (the NULLS LAST tail of the window form)
    if (used < keep) {
      val taken = new java.util.BitSet(k)
      var j = 0
      while (j < used) { taken.set(idx(j)); j += 1 }
      var c = 0
      while (used < keep && c < k) {
        if (!taken.get(c)) { idx(used) = c; used += 1 }
        c += 1
      }
    }
    new GenericArrayData(idx)
  }
}
