package graft.functions.expressions

import java.nio.ByteBuffer


import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count-Min Sketch frequency aggregate: per-group state is a fixed `d`×`w`
 * long counter matrix, so the map-side partial is O(d·w) regardless of
 * group cardinality and the merge is an elementwise add. CMS is a LINEAR
 * sketch — the counters are independent of row order and partitioning, so
 * the native aggregate is bit-equal to the explode+groupBy SQL twin
 * ([[graft.operators.Sketch.cmsCountersSql]]) and, in the SHA family,
 * bit-reproducible in DuckDB (the q52 oracle).
 *
 * Row `j`'s bucket for a value v:
 *  - SHA family (`sha = true`, oracle parity): `ShaLanes` 60-bit lane of
 *    the string `"j|" + v`, modulo `w`;
 *  - xxhash64 family (`sha = false`, scale path): the seed-chained
 *    `xxhash64(j, v)` (the [[MinHashSig]] seed scheme) shifted to 60 bits,
 *    modulo `w`.
 *
 * Returns the counters as `array<array<long>>` (d rows of w). A key's
 * count estimate is `min_j counters(j)(bucket_j(key))` — an upper bound
 * on the true count (overestimate ≤ 2N/w with probability 1 − 2^−d).
 */
case class CmsSketch(child: Expression, d: Int, w: Int, sha: Boolean,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && w >= 1, "CMS needs d >= 1 rows and w >= 1 buckets")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cms expects a StringType value, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  /** xx-family seed chain head for row j (identical to [[MinHashUtil]]'s
    * `xxhash64(j, value)` scheme). */
  private lazy val xxSeeds: Array[Long] =
    Array.tabulate(d)(j => org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, 42L))

  /** "j|" digest-seed prefixes for the SHA family (the [[MinHashShaUtil]]
    * convention), bytes precomputed once. */
  private lazy val shaPrefixes: Array[Array[Byte]] =
    Array.tabulate(d)(j => s"$j|".getBytes("UTF-8"))

  private def bucket(j: Int, v: UTF8String): Int =
    if (sha)
      // thread-local digest + direct nibble lane (ShaLaneUtil) — the
      // hex-string jvmLane form costs ~10x per call
      (ShaLaneUtil.lane(ShaLaneUtil.digest(shaPrefixes(j), v.getBytes), 1) % w).toInt
    else {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(v, xxSeeds(j))
      ((h >>> 4) % w).toInt
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var j = 0
      while (j < d) { buf(j * w + bucket(j, s)) += 1; j += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(Array.tabulate(d) { j =>
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, j * w, (j + 1) * w))
    })

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)

  override def prettyName: String = if (sha) "graft_cms_sha" else "graft_cms"
}
