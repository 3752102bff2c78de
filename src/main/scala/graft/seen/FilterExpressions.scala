package graft.seen

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Catalyst surface for the seen-set filters:
 *  - `bloom_agg(hash, numBlocks)`   -> binary blocked-Bloom blob
 *  - `cuckoo_agg(hash, numBuckets)` -> binary cuckoo blob
 *  - `might_contain_filter(filter, hash)` -> boolean, filter held as a plan
 *    reference object (deserialized once per executor, codegen'd probe).
 *
 * The aggregates are `TypedImperativeAggregate`s (partial aggregation =
 * per-partition filter build, merge = OR / fingerprint re-insert), so the
 * expensive build is map-side parallel and only filter blobs shuffle.
 */
case class BloomAgg(
    child: Expression,
    numBlocks: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BlockedBloom] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BlockedBloom = BlockedBloom(numBlocks)
  override def update(buf: BlockedBloom, input: InternalRow): BlockedBloom = {
    val v = child.eval(input)
    if (v != null) buf.put(v.asInstanceOf[Long])
    buf
  }
  override def merge(buf: BlockedBloom, other: BlockedBloom): BlockedBloom = buf.or(other)
  override def eval(buf: BlockedBloom): Any = buf.serialize()
  override def serialize(buf: BlockedBloom): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): BlockedBloom = BlockedBloom.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

case class CuckooAgg(
    child: Expression,
    numBuckets: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CuckooFilter] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cuckoo_agg"

  override def createAggregationBuffer(): CuckooFilter = CuckooFilter(numBuckets)
  override def update(buf: CuckooFilter, input: InternalRow): CuckooFilter = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }
  override def merge(buf: CuckooFilter, other: CuckooFilter): CuckooFilter = buf.absorb(other)
  override def eval(buf: CuckooFilter): Any = buf.serialize()
  override def serialize(buf: CuckooFilter): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): CuckooFilter = CuckooFilter.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CuckooAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CuckooAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CuckooAgg =
    copy(child = newChild)
}

/**
 * Probe a [[MembershipFilter]] carried as a plan reference object (mirrors
 * Spark's own BloomFilterMightContain: `ctx.addReferenceObj` + direct call in
 * generated code — stays inside whole-stage codegen).
 */
case class MightContainFilter(filter: MembershipFilter, child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any = filter.mightContain(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("seenFilter", filter, classOf[MembershipFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContain($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): MightContainFilter =
    copy(child = newChild)
  override def prettyName: String = "might_contain_filter"
}

object FilterExprs {
  def bloom_agg(hash: Column, numBlocks: Int): Column =
    Bridge.column(
      BloomAgg(Bridge.expression(hash), numBlocks).toAggregateExpression())
  def cuckoo_agg(hash: Column, numBuckets: Int): Column =
    Bridge.column(
      CuckooAgg(Bridge.expression(hash), numBuckets).toAggregateExpression())
  def might_contain(filter: MembershipFilter, hash: Column): Column =
    Bridge.column(MightContainFilter(filter, Bridge.expression(hash)))
}
