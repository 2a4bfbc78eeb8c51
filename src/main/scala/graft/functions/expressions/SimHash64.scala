package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * 64-bit SimHash fingerprint of a token array as one per-row pass — the
 * zero-shuffle form of near-dup fingerprinting (training-data dedup
 * extension; corpus posture per reference README.md:45-47).
 *
 * Replaces the aggregation formulation ([[graft.operators.Dedup.simhashAgg]]:
 * explode tokens → groupBy(doc) with 64 SUM columns), which costs a full
 * shuffle of every token. This expression computes the same fingerprint in
 * the scan projection: at 100 TB the fingerprint step becomes I/O-bound
 * instead of shuffle-bound, and only the 8-byte fingerprints ever move.
 *
 * Bit-identical to the aggregation version: token hash =
 * `xxhash64(token)` (XXH64, seed 42 — the exact function the SQL
 * `xxhash64` uses; NULL tokens contribute the seed, matching XxHash64's
 * null-skip), bit j of the result is set iff strictly more tokens have
 * bit j set than clear.
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SimHashUtil$$.MODULE$$.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Compiled SimHash kernel shared by interpreted eval and generated code. */
object SimHashUtil {

  final val Seed = 42L  // the SQL xxhash64 seed

  def simhash64(toks: ArrayData): Long = {
    val counts = new Array[Int](64)
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      val h =
        if (toks.isNullAt(i)) Seed
        else XXH64.hashUTF8String(toks.getUTF8String(i), Seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}
