package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Compiled SHA-256 lane primitives shared by the oracle-parity scan-side
 * kernels ([[MinHashShaSig]], [[SimHashSha]]). A *lane* here is exactly
 * the [[graft.functions.ShaLanes]] contract — 15 hex chars (60 bits) of
 * the digest parsed as a long — extracted straight from the digest bytes
 * (nibble arithmetic), skipping the hex-string round-trip the built-in
 * `sha2`/`substring`/`conv` formulation pays per value.
 */
object ShaLaneUtil {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }

  def digest(prefix: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    val m = md.get()
    m.reset()
    if (prefix.length > 0) m.update(prefix)
    m.update(payload)
    m.digest()
  }

  /** Lane at 1-based hex offset `o`: nibbles (o-1)..(o+13) of the digest,
    * bit-identical to `conv(substring(hex, o, 15), 16, 10)`. */
  def lane(d: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = o - 1
    val end = o + 14
    while (i < end) {
      val b = d(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/**
 * Oracle-parity MinHash signature as one compiled per-row pass: component
 * i = min over word-n-gram shingles of SHA-256 lane i%4 of
 * `"(i/4)|" ++ shingle` — bit-identical to the aggregation formulation
 * ([[graft.operators.Dedup.minhashSignaturesShaAgg]]: shingle explode →
 * 4 sha2 digests → 16 conv lanes → groupBy MINs) and therefore to the
 * DuckDB oracle, but computed in the scan projection: ZERO shuffle, no
 * hex strings, one thread-local MessageDigest. The sha-family twin of
 * [[MinHashSig]] (which stays the cheaper xxhash64 scale path when no
 * SQL oracle is needed).
 */
case class MinHashShaSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && numHashes >= 1 && numHashes <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sha expects (array<string>, n >= 1, 1 <= numHashes <= 64), got " +
        s"${other.catalogString} with n=$n, numHashes=$numHashes")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashShaUtil.signature(v.asInstanceOf[ArrayData], n, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val util = "graft.functions.expressions.MinHashShaUtil$.MODULE$"
      s"""
         |${ev.value} = $util.signature($c, $n, $numHashes);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashShaSig =
    copy(child = newChild)
}

object MinHashShaUtil {

  private val Space = UTF8String.fromString(" ")
  /** digest-seed prefixes "0|", "1|", … (digest s yields lanes 4s..4s+3). */
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(16)(s => s"$s|".getBytes("UTF-8"))
  /** 1-based hex offsets of the four lanes within one digest. */
  private val offsets = Array(1, 16, 31, 46)

  def signature(toks: ArrayData, n: Int, k: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return null
    val nDigests = (k + 3) / 4
    val mins = Array.fill(k)(Long.MaxValue)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        window(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      val shingle = UTF8String.concatWs(Space, window: _*).getBytes
      var s = 0
      while (s < nDigests) {
        val d = ShaLaneUtil.digest(prefixes(s), shingle)
        var j2 = 0
        while (j2 < 4 && s * 4 + j2 < k) {
          val c = s * 4 + j2
          val h = ShaLaneUtil.lane(d, offsets(j2))
          if (h < mins(c)) mins(c) = h
          j2 += 1
        }
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/**
 * Oracle-parity 60-bit SimHash as one compiled per-row pass: token hash =
 * SHA-256 lane of the token; bit j of the fingerprint is set iff
 * Σ_tokens (±1 by bit j of the lane) > 0 — bit-identical to the
 * aggregation formulation ([[graft.operators.Dedup.simhashShaAgg]]:
 * token explode → 60 SUMs → bit fold) and therefore to the DuckDB
 * oracle, but a ZERO-shuffle scan projection. A NULL token element
 * contributes -1 to every bit, matching the SQL `CASE WHEN (NULL)=1 …
 * ELSE -1` semantics of the spec formulation. The sha-family twin of
 * [[SimHash64]] (the xxhash64 scale path).
 */
case class SimHashSha(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_sha expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashShaUtil.fingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SimHashShaUtil$$.MODULE$$.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSha =
    copy(child = newChild)
}

object SimHashShaUtil {

  private val NoPrefix = Array.emptyByteArray

  def fingerprint(toks: ArrayData): Long = {
    val m = toks.numElements()
    val w = new Array[Int](60)
    var i = 0
    while (i < m) {
      if (toks.isNullAt(i)) {
        var j = 0
        while (j < 60) { w(j) -= 1; j += 1 }
      } else {
        val d = ShaLaneUtil.digest(NoPrefix, toks.getUTF8String(i).getBytes)
        val h = ShaLaneUtil.lane(d, 1)
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) w(j) += 1 else w(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (w(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}
