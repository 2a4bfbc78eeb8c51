package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Sign-LSH signature of an embedding under one hash table, as one compiled
 * pass (the bucketing step of [[graft.operators.Knn.lshTopK]] — the
 * approximate path for the reference's top-K similarity, README.md:72,116).
 *
 * Bit p of the result = [dot(v, plane_{table,p}) >= 0], where component d
 * of pseudo-random plane p is the `xxhash64(table, p, d)` chain mapped to
 * [-1, 1) — exactly the HOF formulation
 * ([[graft.operators.Knn.lshSignatureHof]]), which Spark evaluates
 * interpreted at ~bits × dims lambda calls per row; this expression runs
 * the same arithmetic in a tight loop from whole-stage codegen,
 * bit-identical (sequential accumulation, same hash chain
 * `hashInt(d, hashInt(p, hashInt(table, 42)))`).
 */
case class LshSig(child: Expression, bits: Int, table: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if bits >= 1 && bits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_sig expects (array<float|double>, 1 <= bits <= 63), got " +
        s"${other.catalogString} with bits=$bits")
  }

  override def dataType: DataType = LongType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    LshSigUtil.signature(input.asInstanceOf[ArrayData], bits, table, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.LshSigUtil$$.MODULE$$.signature($c, $bits, $table, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): LshSig =
    copy(child = newChild)
}

/** Compiled sign-LSH kernel shared by interpreted eval and generated code. */
object LshSigUtil {

  /** seed chain head for plane p of `table`: hashInt(p, hashInt(table, 42)). */
  private def planeSeeds(bits: Int, table: Int): Array[Long] = {
    val t = XXH64.hashInt(table, 42L)
    Array.tabulate(bits)(p => XXH64.hashInt(p, t))
  }

  def signature(vec: ArrayData, bits: Int, table: Int, float: Boolean): Long = {
    val seeds = planeSeeds(bits, table)
    val m = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < bits) {
      var proj = 0.0
      var d = 0
      while (d < m) {
        val x = if (float) vec.getFloat(d).toDouble else vec.getDouble(d)
        val comp = XXH64.hashInt(d, seeds(p)).toDouble / Long.MaxValue.toDouble
        proj += x * comp
        d += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
