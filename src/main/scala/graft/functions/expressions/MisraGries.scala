package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries heavy-hitters summary (Misra & Gries 1982) as a mergeable
 * aggregate — the deterministic frequent-items counterpart to the
 * [[CmsSketch]] point-query counters: CMS answers "how often did THIS
 * token occur", Misra–Gries answers "WHICH tokens occurred often" without
 * knowing them in advance.
 *
 * State is at most k (item, weight) counters. Update: increment a held
 * counter, claim a free slot, or decrement ALL counters (the classic
 * k-way cancellation). Merge (Agarwal et al., Mergeable Summaries, PODS
 * 2012): sum both counter sets, then subtract the (k+1)-th largest weight
 * from every counter and drop the non-positive — the bound survives
 * merging, so map-side partials stay O(k) per partition and the shuffle
 * carries ≤ k entries regardless of token cardinality.
 *
 * Guarantee: true_count − N/(k+1) ≤ weight ≤ true_count, so EVERY item
 * with true_count > N/(k+1) is present in the summary (no false
 * negatives above threshold). That makes the summary the candidate
 * generator of an EXACT two-pass heavy-hitters query: re-count just the
 * ≤ k candidates exactly (broadcast semi-join — the re-count shuffle
 * carries only candidate tokens) and filter `cnt·(k+1) > N` in integer
 * arithmetic. The final answer is exact and engine-independent, which is
 * what lets a DuckDB oracle verify a sketch-driven plan hash-for-hash.
 *
 * Returns the summary as `map<string,bigint>` (item → lower-bound
 * weight). NULL inputs are ignored.
 */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k >= 1, "misra-gries needs k >= 1 counters")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_misra_gries expects a string item, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = e.getValue - by
      if (w <= 0L) it.remove() else e.setValue(w)
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      if (buf.containsKey(item)) { buf.put(item, buf.get(item) + 1L); () }
      else if (buf.size < k) { buf.put(item, 1L); () }
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = if (buf.containsKey(e.getKey)) buf.get(e.getKey) else 0L
      buf.put(e.getKey, prev + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest weight from every counter
      val ws = new Array[Long](buf.size)
      val vs = buf.values().iterator()
      var i = 0
      while (vs.hasNext) { ws(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(ws)
      decrementAll(buf, ws(ws.length - k - 1))
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val n = buf.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = e.getValue
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    while (it0.hasNext) {
      val e = it0.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries.add((b, e.getValue))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size)
    var i = 0
    while (i < entries.size) {
      val (b, w) = entries.get(i)
      bb.putInt(b.length); bb.put(b); bb.putLong(w)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_misra_gries"
}
