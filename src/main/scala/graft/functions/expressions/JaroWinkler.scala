package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Jaro-Winkler similarity — the entity-resolution string kernel
 * next to Spark's built-in `levenshtein`: Jaro matching (window
 * ⌊max(|a|,|b|)/2⌋−1, greedy left-to-right, half-transposition count)
 * with the Winkler common-prefix bonus (≤ 4 chars, scaling 0.1, applied
 * only when jaro > 0.7). Spark has no built-in; a Scala UDF would break
 * whole-stage codegen on exactly the candidate-verification scans where
 * this runs.
 *
 * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (probed:
 * boost threshold 0.7, prefix cap 4, p = 0.1; both-empty → 0.0,
 * either-empty → 0.0, NULL in → NULL out), so declared queries using the
 * kernel hash-match the oracle without a SHA twin: the score is exact
 * rational arithmetic (m, t, lengths are integers) evaluated in the same
 * double formula on both engines.
 *
 * Codegen calls the static [[JaroWinkler.compute]] (the same pattern as
 * Spark's own `levenshtein` → UTF8String method call): the loop body
 * stays a JVM-compiled method, the call stays inside the generated scan
 * loop, no interpreted expression trees on the hot path. Cost is
 * O(|a|·window) time, O(|a|+|b|) per-call scratch — like the house
 * bounded-Levenshtein discipline, it belongs AFTER a banding/blocking
 * stage ([[graft.operators.Dedup.editDistanceVerify]]'s shape), never in
 * an all-pairs join.
 */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static entry the generated code calls (UTF8String in, score out).
    * Scores UTF-8 BYTES, exactly like DuckDB — a multi-byte code point
    * counts as its byte length and matches byte-by-byte ('café' vs
    * 'cafe' = 0.848333…, probed), so parity holds beyond ASCII. */
  def compute(au: UTF8String, bu: UTF8String): Double =
    score(au.getBytes, bu.getBytes)

  /** Test/JVM convenience: score two Strings via their UTF-8 bytes. */
  def score(a: String, b: String): Double =
    score(a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def score(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var halfT = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    // FLOORED half-transposition count (integer /2), matching DuckDB: a
    // 3-cycle mismatch ('abcXYZ' vs 'cabXYZ', 3 mismatched positions)
    // counts t=1, not 1.5 — fuzz-verified against DuckDB; the fractional
    // form diverged on 611/20k random pairs.
    val t = (halfT / 2).toDouble
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val pMax = math.min(4, math.min(la, lb))
    while (p < pMax && a(p) == b(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}
