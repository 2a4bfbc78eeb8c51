package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * MinHash signature of a token array as one per-row pass: component i is
 * `min over word-n-gram shingles of xxhash64(i, shingle)` (training-data
 * near-dup dedup extension; corpus posture per reference README.md:45-47).
 *
 * Replaces the aggregation formulation
 * ([[graft.operators.Dedup.minhashSignaturesAgg]]: explode shingles →
 * groupBy(doc) with numHashes MIN columns), which shuffles every shingle.
 * This expression computes the signature in the scan projection — zero
 * shuffle; only |docs| × numHashes longs move downstream.
 *
 * Bit-identical to the aggregation version: component seeds follow the
 * SQL `xxhash64(i, shingle)` chain — `seed_i = XXH64.hashInt(i, 42)`,
 * `h = XXH64.hashUTF8String(shingle, seed_i)` — and shingles are n
 * consecutive tokens joined by single spaces (duplicate shingles don't
 * affect a min). NULL for documents with fewer than n tokens (the
 * aggregation form simply has no row for them).
 */
case class MinHashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && numHashes >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (array<string>, n >= 1, numHashes >= 1), got " +
        s"${other.catalogString} with n=$n, numHashes=$numHashes")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashUtil.signature(v.asInstanceOf[ArrayData], n, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val util = "graft.functions.expressions.MinHashUtil$.MODULE$"
      s"""
         |${ev.value} = $util.signature($c, $n, $numHashes);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Compiled MinHash kernel shared by interpreted eval and generated code. */
object MinHashUtil {

  private val Space = UTF8String.fromString(" ")

  /** seed_i chain head for `xxhash64(i, shingle)`. */
  private def seeds(k: Int): Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  def signature(toks: ArrayData, n: Int, k: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return null
    val sd = seeds(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        window(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      val sh = UTF8String.concatWs(Space, window: _*)
      var c = 0
      while (c < k) {
        val h = XXH64.hashUTF8String(sh, sd(c))
        if (h < mins(c)) mins(c) = h
        c += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
