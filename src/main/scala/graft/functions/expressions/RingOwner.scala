package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Consistent-hash ring successor lookup as a codegen'd binary search —
 * the native kernel behind [[graft.operators.Shard]] (Karger et al. 1997
 * ring placement; reference README.md:45-47 entity routing class): given
 * a key's 60-bit hash lane, return the owner of the first ring point at
 * or after it, wrapping to the ring head past the last point.
 *
 * Replaces the `filter(sortedArrayLiteral, pt >= h)[0]` higher-order-
 * function formulation: HOFs evaluate their lambda INTERPRETED (one
 * `LambdaFunction` invocation per element — for q197's two rings of
 * 128/144 points that was ~272 interpreted struct comparisons per row,
 * the whole query's hot cost), while this expression is a reference-
 * object binary search (≤8 long compares) inside whole-stage codegen.
 * Semantics for NON-NULL input are bit-identical to the HOF form: first
 * `pt >= h` wins, empty suffix wraps to index 0. NULL input differs: as
 * a null-intolerant UnaryExpression this returns NULL, where the HOF's
 * coalesce fallback returned the ring head — callers wanting the
 * historical NULL→head contract wrap the call in `coalesce(..., head)`,
 * as [[graft.operators.Shard.ownerOfLane]] does.
 * The ring (points + owners, hundreds of
 * bytes) rides into generated code as reference objects, so the source
 * text is byte-identical across rings and the Janino cache serves every
 * plan (the [[NearestCentroid]] pattern).
 *
 * 100 TB posture: ownership stays a pure projection — zero joins,
 * shuffles, or windows on the keyed corpus; the ring is driver-side
 * metadata bounded by nodes × vnodes.
 */
case class RingOwner(child: Expression, points: Seq[Long],
                     owners: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if points.nonEmpty && points.size == owners.size &&
      points.sliding(2).forall(w => w.size < 2 || w(0) <= w(1)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ring_owner expects (BIGINT hash, non-empty SORTED ring with " +
        s"matching owners), got ${other.catalogString} with ${points.size} " +
        s"points / ${owners.size} owners")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_ring_owner"

  @transient private lazy val pts: Array[Long] = points.toArray
  @transient private lazy val own: Array[UTF8String] =
    owners.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    RingOwnerUtil.owner(input.asInstanceOf[Long], pts, own)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("ringPts", pts, "long[]")
    val o = ctx.addReferenceObj("ringOwners", own, "UTF8String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.RingOwnerUtil$$.MODULE$$.owner($c, $p, $o)")
  }

  override protected def withNewChildInternal(newChild: Expression): RingOwner =
    copy(child = newChild)
}

object RingOwnerUtil {
  /** First index with pts(i) >= h (lower bound), wrapping to 0 — the
    * successor-on-a-ring rule. pts is sorted ascending (checked at
    * analysis time). */
  def owner(h: Long, pts: Array[Long], owners: Array[UTF8String]): UTF8String = {
    var lo = 0
    var hi = pts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (pts(mid) >= h) hi = mid else lo = mid + 1
    }
    owners(if (lo == pts.length) 0 else lo)
  }
}
