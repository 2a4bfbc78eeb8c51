package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/**
 * HyperLogLog distinct-count sketch as a mergeable aggregate — the
 * constant-space member of the sketch family (KMV keeps k longs per
 * group; HLL keeps exactly `2^p` BYTES per group, independent of both
 * cardinality and k-tuning): per-group state is the register array
 * `M[0 .. 2^p)`, map-side partials merge by elementwise max, so the
 * shuffle carries `2^p` bytes per group per partition no matter how many
 * values stream through.
 *
 * Register derivation over the 60-bit [[graft.functions.ShaLanes]] space
 * (lane uniform in [0, 2^60)):
 *   bucket = lane >>> (60 - p)           — top p bits
 *   w      = lane & (2^(60-p) - 1)       — remaining 60-p bits
 *   rho    = leading zeros of w within its (60-p)-bit word, plus 1
 *            (w == 0 → 60-p+1)
 *   M[bucket] = max(M[bucket], rho)
 *
 * Estimator (Flajolet et al., the classic HLL form):
 *   E = alpha_m · m² / Σ_j 2^{-M[j]}        (empty registers add 2^0 = 1)
 *   if E ≤ 2.5·m and V > 0 (V = empty registers): E = m·ln(m/V)
 * No large-range correction: the 60-bit lane space makes collisions
 * negligible at any cardinality this engine meets. RSE ≈ 1.04/√m.
 *
 * Every step is plain integer/double arithmetic on the SHA lane, so the
 * whole sketch is reproducible in DuckDB SQL (`bin(w)` gives the minimal
 * binary string in both engines, so `length(bin(w)) - 1` is floor(log2 w)
 * exactly — no floating log2 on 51-bit integers, which rounds up near
 * powers of two). The window/groupBy mirror is
 * [[graft.operators.Sketch.hllDistinct]]; the q104 oracle runs the same
 * shape in DuckDB.
 *
 * Input must already be a hash lane (LongType in [0, 2^60)):
 * [[graft.operators.Sketch.shaLane]] (oracle-parity) or
 * [[graft.operators.Sketch.xxLane]] (scale path). NULL lanes are ignored.
 */
case class HllSketch(child: Expression, p: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"HLL needs 4 <= p <= 16, got $p")

  private val m = 1 << p
  private val wBits = 60 - p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll expects a LongType hash lane, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val lane = v.asInstanceOf[Long]
      val bucket = ((lane >>> wBits) & (m - 1)).toInt
      val w = lane & ((1L << wBits) - 1)
      val rho =
        if (w == 0L) wBits + 1
        else wBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) { if (other(j) > buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  /** alpha_m from the HLL paper — the SQL mirror hardcodes the same
    * values, so keep the two in sync (SketchSpec cross-checks). */
  private def alpha: Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  override def eval(buf: Array[Byte]): Any = {
    // denom = Σ_present 2^-M[j] + (#empty registers) · 2^0, grouped the
    // same way the SQL mirror groups it (present-bucket sum, then the
    // empty-register count in one addition) so the two double pipelines
    // stay aligned to well under the round(4) the queries apply
    var present = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      val r = buf(j).toInt
      if (r == 0) zeros += 1
      else present += 1.0 / (1L << r).toDouble
      j += 1
    }
    val denom = present + zeros.toDouble
    val raw = alpha * m.toDouble * m.toDouble / denom
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_hll"
}
