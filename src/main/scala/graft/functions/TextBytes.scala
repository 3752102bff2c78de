package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object TextBytesUtil {
  /** Longest prefix of `s` whose UTF-8 encoding is <= maxBytes OCTETS,
    * cutting only at character boundaries (the reference truncates raw
    * response bytes, client.go:190-194; we keep the string column valid
    * UTF-8, so a multi-byte character straddling the cap is dropped whole —
    * at most 3 bytes shorter than the raw-byte cut). */
  def utf8Truncate(s: UTF8String, maxBytes: Int): UTF8String = {
    if (s.numBytes <= maxBytes) return s
    val bytes = s.getBytes
    var end = 0
    while (end < bytes.length) {
      val n = UTF8String.numBytesForFirstByte(bytes(end))
      if (end + n > maxBytes) return UTF8String.fromBytes(bytes, 0, end)
      end += n
    }
    s
  }
}

/** `utf8_byte_truncate(str, maxBytes)`: byte-denominated cap on a string
  * column (codegen'd static call) — `substring` counts CHARACTERS and would
  * let a multibyte payload exceed a byte limit by up to 4x. */
case class Utf8ByteTruncate(child: Expression, maxBytes: Int) extends UnaryExpression {
  require(maxBytes >= 0, "maxBytes must be >= 0")
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextBytesUtil.utf8Truncate(v.asInstanceOf[UTF8String], maxBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextBytesUtil.utf8Truncate($c, $maxBytes);")
  override protected def withNewChildInternal(newChild: Expression): Utf8ByteTruncate =
    copy(child = newChild)
  override def prettyName: String = "utf8_byte_truncate"
}

object TextBytes {
  def utf8_byte_truncate(c: Column, maxBytes: Int): Column =
    Bridge.column(Utf8ByteTruncate(Bridge.expression(c), maxBytes))
}
