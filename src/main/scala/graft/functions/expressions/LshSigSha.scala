package graft.functions.expressions

import graft.functions.ShaLanes
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Oracle-parity sign-LSH signature: like [[LshSig]] but hyperplane
 * component d of plane p in table t is the SHA-256 lane of `"t,p,d"`
 * mapped to [-1, 1) ([[ShaLanes.jvmLane]]) — a hash family DuckDB can
 * reproduce exactly (a `range(t)×range(p)×range(d)` plane CTE +
 * `list_dot_product`), so the whole bucketed-kNN pipeline hash-matches
 * its oracle. The plane matrix is a deterministic constant, computed once
 * per (table, bits, dim) and cached process-wide; the per-row work is the
 * same tight dot-product loop as [[LshSig]], still a scan-side projection
 * inside whole-stage codegen with zero shuffle.
 *
 * Sequential d-order accumulation keeps the projection bit-identical to
 * DuckDB's `list_dot_product(v::DOUBLE[], plane)`.
 */
case class LshSigSha(child: Expression, bits: Int, table: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if bits >= 1 && bits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_sig_sha expects (array<float|double>, 1 <= bits <= 63), got " +
        s"${other.catalogString} with bits=$bits")
  }

  override def dataType: DataType = LongType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    LshSigShaUtil.signature(input.asInstanceOf[ArrayData], bits, table, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.LshSigShaUtil$$.MODULE$$.signature($c, $bits, $table, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): LshSigSha =
    copy(child = newChild)
}

/** Compiled sha-plane sign-LSH kernel shared by interpreted eval and
  * generated code. */
object LshSigShaUtil {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]

  /** plane(p)(d) for hash table `table`: SHA-256 lane of "t,p,d" → [-1, 1). */
  def planes(table: Int, bits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((table, bits, dim), _ =>
      Array.tabulate(bits)(p => Array.tabulate(dim)(d =>
        ShaLanes.jvmLane(s"$table,$p,$d") / ShaLanes.HalfLane - 1.0)))

  def signature(vec: ArrayData, bits: Int, table: Int, float: Boolean): Long = {
    val m = vec.numElements()
    val pl = planes(table, bits, m)
    var sig = 0L
    var p = 0
    while (p < bits) {
      val plane = pl(p)
      var proj = 0.0
      var d = 0
      while (d < m) {
        val x = if (float) vec.getFloat(d).toDouble else vec.getDouble(d)
        proj += x * plane(d)
        d += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
