package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Element-wise sum of dense vectors as a true mergeable aggregate: the
 * per-group state is ONE `dim`-wide double array, so the map-side partial
 * keeps state O(dim) regardless of group size and the shuffle carries a
 * single summed vector per (group × partition). This is the k-means
 * training aggregate ([[graft.operators.Knn.kmeansCentroids]]'s Lloyd
 * update): `groupBy(cid).agg(vector_sum(vec), count(*))` replaces the
 * `posexplode(vec)` → `groupBy(cid, pos).avg` formulation, which
 * materializes corpus×dim rows through the map-side hash aggregate before
 * combining (the explode form is retained as the executable spec —
 * identical means by construction, since both sum the same doubles per
 * position and divide by the same count).
 *
 * Contract: all non-NULL input vectors in a group must share one
 * dimension, and elements must be non-NULL — a silent skip would desync
 * the element sums from the row count the caller divides by, so both
 * violations fail fast. NULL *vectors* are ignored (like every Spark
 * aggregate); an all-NULL group evaluates to NULL.
 */
case class VectorSum(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vector_sum expects array<double|float>, got ${other.catalogString}")
  }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // empty array = "no input seen yet"; the dimension is fixed by the
  // first non-NULL vector (zero-dim vectors sum to NULL like no input)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val ad = v.asInstanceOf[ArrayData]
      val n = ad.numElements()
      val acc = if (buf.length == 0) new Array[Double](n) else buf
      require(acc.length == n,
        s"graft_vector_sum: dimension mismatch in group ($n vs ${acc.length})")
      var i = 0
      while (i < n) {
        require(!ad.isNullAt(i), "graft_vector_sum: NULL vector element")
        acc(i) += (if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i))
        i += 1
      }
      acc
    }
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    if (other.length == 0) buf
    else if (buf.length == 0) other
    else {
      require(buf.length == other.length,
        s"graft_vector_sum: dimension mismatch in merge (${other.length} vs ${buf.length})")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSum =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_vector_sum"
}
