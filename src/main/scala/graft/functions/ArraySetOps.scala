package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

object ArraySetUtil {
  /** |a ∩ b| for SORTED long arrays via merge walk — no per-row hash-set
    * allocation (the built-in array_intersect builds one per call; at
    * millions of candidate pairs that allocation dominates LSH verify). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    var i = 0; var j = 0; var n = 0
    val la = a.numElements(); val lb = b.numElements()
    while (i < la && j < lb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** `sorted_intersect_count(a, b)`: intersection size of two pre-sorted,
  * deduplicated array<long> columns (codegen'd static call). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    ArraySetUtil.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArraySetUtil.sortedIntersectCount($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

object ArraySetOps {
  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
