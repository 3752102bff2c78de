package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * An ordered (pattern, replacement) scrub chain compiled once per JVM and
 * applied with ONE matcher traversal per stage that both COUNTS the
 * non-overlapping matches and REPLACES them — where a
 * `regexp_count(s_i) + regexp_replace(s_i)` pair costs two full regex
 * passes over every row (10 for the 5-stage PII chain), this costs one
 * (5 total), and the string materializes from UTF8 exactly once per row
 * instead of once per stage.
 *
 * Semantics are bit-identical to the staged pair: `Matcher.find` is the
 * same left-to-right non-overlapping scan `regexp_count` performs, and the
 * replacement is quoted literal text (the chain's placeholders carry no
 * `$`/`\` group references), so stage i+1 sees exactly the string
 * `regexp_replace` would have produced.
 */
final class CompiledScrubChain(val chain: Seq[(String, String)]) extends Serializable {
  require(chain.nonEmpty, "scrub chain must not be empty")
  // compile lazily per-JVM: Pattern is Serializable but recompiling from
  // source on each executor is cheaper and safer than shipping it
  @transient private lazy val pats: Array[Pattern] =
    chain.map { case (p, _) => Pattern.compile(p) }.toArray
  @transient private lazy val reps: Array[String] =
    chain.map { case (_, r) => Matcher.quoteReplacement(r) }.toArray

  // value equality over the chain: RegexScrubCount is a case class, so
  // without this two SQL calls over the same chain (the builder constructs
  // a fresh CompiledScrubChain per parsed call) would never be
  // semanticEquals — defeating common-subexpression elimination and plan
  // canonicalization for the exact expression whose point is running once
  override def equals(o: Any): Boolean = o match {
    case c: CompiledScrubChain => c.chain == chain
    case _ => false
  }
  override def hashCode: Int = chain.hashCode

  def scrubCount(s: UTF8String): InternalRow = {
    var cur = s.toString
    val out = new Array[Any](chain.length + 1)
    var i = 0
    while (i < pats.length) {
      val m = pats(i).matcher(cur)
      var n = 0L
      if (m.find()) {
        val sb = new java.lang.StringBuilder(cur.length + 16)
        do {
          n += 1
          m.appendReplacement(sb, reps(i))
        } while (m.find())
        m.appendTail(sb)
        cur = sb.toString
      }
      out(i + 1) = n
      i += 1
    }
    out(0) = UTF8String.fromString(cur)
    new GenericInternalRow(out)
  }
}

/**
 * `regex_scrub_count(text)` over a fixed chain: returns
 * `struct<clean string, n0 bigint, ..., n{k-1} bigint>` where `clean` is
 * the fully-scrubbed text and `n_i` counts stage i's matches in the text
 * AFTER stages 0..i-1 were applied — the exact contract of
 * `TextOps.piiReport`'s staged `regexp_count`/`regexp_replace` ladder,
 * fused to one pass per stage.
 *
 * Callers MUST stage the struct as a real attribute (its own projection)
 * and read fields off the attribute: the expression is not "cheap", so
 * `CollapseProject` will not inline it under multiple `GetStructField`
 * consumers, keeping the scrub at exactly one evaluation per row.
 */
case class RegexScrubCount(child: Expression, compiled: CompiledScrubChain)
    extends UnaryExpression {
  override def dataType: DataType = StructType(
    StructField("clean", StringType, nullable = false) +:
      compiled.chain.indices.map(i => StructField(s"n$i", LongType, nullable = false)))
  override protected def nullSafeEval(t: Any): Any =
    compiled.scrubCount(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val chainRef =
      ctx.addReferenceObj("scrubChain", compiled, classOf[CompiledScrubChain].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $chainRef.scrubCount($t);")
  }
  override protected def withNewChildInternal(c: Expression): RegexScrubCount =
    copy(child = c)
  override def prettyName: String = "regex_scrub_count"
}

object RegexScrub {
  def regex_scrub_count(text: Column, chain: Seq[(String, String)]): Column =
    Bridge.column(RegexScrubCount(Bridge.expression(text), new CompiledScrubChain(chain)))
}
