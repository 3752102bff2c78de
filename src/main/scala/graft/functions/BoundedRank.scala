package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bounded-state k-th-smallest: a max-heap of the k smallest values seen,
 * evaluating to the heap's max — i.e. the k-th smallest value in the group
 * (or the group max when the group has fewer than k rows).
 *
 * This is the skew-safe building block for exact per-key caps ("keep at
 * most N pages per domain"): `rank() OVER (PARTITION BY domain)` serializes
 * a hot domain's 10⁹ rows into one window partition, while this aggregate
 * partial-aggregates every scan task down to ≤ k values before the shuffle
 * — the shuffle moves O(k · tasks) bytes per key no matter how hot the key
 * is, and `value <= kth_smallest` then keeps exactly k rows (coin values
 * being unique). Same TypedImperativeAggregate family as the seen-set
 * filter builds (seen/FilterExpressions.scala).
 */
class BoundedTopK(val k: Int) {
  // max-heap over binary UTF8String order (compareTo is unsigned bytewise)
  val heap = new java.util.PriorityQueue[UTF8String](
    math.max(k, 1), java.util.Collections.reverseOrder[UTF8String]())

  def insert(v: UTF8String): Unit =
    if (heap.size < k) heap.add(v.clone())
    else if (v.compareTo(heap.peek()) < 0) { heap.poll(); heap.add(v.clone()) }

  def absorb(o: BoundedTopK): BoundedTopK = { o.heap.forEach(insert(_)); this }

  /** The k-th smallest seen (group max when under k); null for empty. */
  def kth: UTF8String = heap.peek()

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(heap.size)
    heap.forEach { v => val b = v.getBytes; out.writeInt(b.length); out.write(b) }
    out.flush(); bos.toByteArray
  }
}

object BoundedTopK {
  def deserialize(bytes: Array[Byte]): BoundedTopK = {
    val in = ByteBuffer.wrap(bytes)
    val t = new BoundedTopK(in.getInt)
    var n = in.getInt
    while (n > 0) {
      val b = new Array[Byte](in.getInt); in.get(b)
      t.heap.add(UTF8String.fromBytes(b)) // already trimmed to <= k
      n -= 1
    }
    t
  }
}

/** `kth_smallest_agg(value, k)` — see [[BoundedTopK]]. */
case class KthSmallestAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK] with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  // analysis-time rejection of non-string children (otherwise a LongType
  // child resolves fine and every task dies on the UTF8String cast);
  // AbstractDataType is private[sql] in Spark 4, so the check rides
  // checkInputDataTypes rather than ExpectsInputTypes
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kth_smallest_agg requires a STRING child, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "kth_smallest_agg"

  override def createAggregationBuffer(): BoundedTopK = new BoundedTopK(k)
  override def update(buf: BoundedTopK, input: InternalRow): BoundedTopK = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String])
    buf
  }
  override def merge(buf: BoundedTopK, other: BoundedTopK): BoundedTopK = buf.absorb(other)
  override def eval(buf: BoundedTopK): Any = buf.kth
  override def serialize(buf: BoundedTopK): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): BoundedTopK = BoundedTopK.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KthSmallestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KthSmallestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KthSmallestAgg =
    copy(child = newChild)
}

object KthSmallestAgg {
  def kth_smallest_agg(value: Column, k: Int): Column =
    Bridge.column(KthSmallestAgg(Bridge.expression(value), k).toAggregateExpression())
}
