package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Scan-side product-quantization encoder: the m nearest-sub-centroid ids
 * of a vector, computed as one pure projection — the m×k×subDim codebook
 * rides into generated code as a reference object (the
 * [[NearestCentroid]] pattern).
 *
 * Replaces the Column-combinator formulation
 * ([[graft.operators.Pq.encodeColHof]]) whose m·k·subDim-term expression
 * tree (1024 terms at 8×16×8) exceeded codegen method limits and fell
 * back to interpreted eval — 46 s for 40k vectors at sf0.1 vs sub-second
 * for this kernel — and which evaluated every sub-distance twice
 * (`array_position(dists, array_min(dists))` references the array
 * twice).
 *
 * Semantics are bit-identical to the HOF form and the DuckDB oracle:
 * sub-distance = left-assoc sum over d of (v[s·subDim+d] − w)², argmin
 * scans centroids in ascending order with strict `<` (first minimum
 * wins, i.e. `array_position`-of-min / rank-by-(dist, c)); NULL input,
 * NULL element, or a vector shorter than m·subDim → NULL.
 */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      // distinguish the two failure causes — blaming the (valid) child
      // type for a ragged codebook sends the user to the wrong argument
      if (codebook.nonEmpty && codebook.forall(_.nonEmpty) &&
          codebook.flatten.map(_.size).distinct.size == 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "graft_pq_encode: codebook must be non-empty and rectangular " +
          "(equal centroid counts per subspace, equal dims per centroid)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects an array<float|double> input vector, " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // NULL beyond child-null (short vector, NULL element) — without this a
  // non-nullable input column would advertise a non-nullable result and
  // fail decoding at runtime (same contract as MinHashSig/CosineSimilarity)
  override def nullable: Boolean = true

  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val cube: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    PqEncodeUtil.encode(input.asInstanceOf[ArrayData], cube, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", cube, "double[][][]")
    // encode returns null for short/NULL-element vectors, so the generated
    // wrapper must carry nullability through
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("pqCodes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.expressions.PqEncodeUtil$$.MODULE$$.encode($c, $cb, $isFloat);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Compiled PQ-encode kernel shared by interpreted eval and generated
  * code. Returns null (→ SQL NULL) on a short vector or NULL element. */
object PqEncodeUtil {

  def encode(vec: ArrayData, cb: Array[Array[Array[Double]]],
             float: Boolean): ArrayData = {
    val m = cb.length
    val subDim = cb(0)(0).length
    if (vec.numElements() < m * subDim) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val sub = cb(s)
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < sub.length) {
        val w = sub(c)
        var dist = 0.0
        var d = 0
        while (d < subDim) {
          val i = s * subDim + d
          if (vec.isNullAt(i)) return null
          val x = (if (float) vec.getFloat(i).toDouble else vec.getDouble(i)) - w(d)
          dist += x * x
          d += 1
        }
        // strict < over ascending c ≡ first minimum wins (array_position)
        if (dist < best) { best = dist; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }
}
