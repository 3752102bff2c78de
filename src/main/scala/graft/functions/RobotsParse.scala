package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Raw robots.txt parsing (RFC 9309 §2.2) — the PRODUCER for the structured
 * rules frame `Scheduler.robotsFilter` consumes: a crawl fetches per-host
 * robots.txt bodies; this turns each body into `(user_agent, rule_type,
 * path_prefix)` rows. Group structure is inherently sequential (consecutive
 * User-agent lines open a group; Allow/Disallow attach to the most recent
 * group), so parsing runs per BODY inside one expression — a per-host
 * robots.txt is a few KB, and the frame stays narrow (body in, rule array
 * out, explode); no shuffle, no per-line ordering problem.
 *
 * Spec choices (cf. the RobotsSpec goldens for the consumer semantics):
 *  - comments (`#` to end of line) stripped, blank lines skipped
 *  - keys case-insensitive; Crawl-delay (de-facto, group-scoped) is kept
 *    as a `crawl-delay` row for [[graft.frontier.Scheduler.crawlDelays]];
 *    other unknown directives (Sitemap, …) ignored
 *  - rules BEFORE any User-agent line are ignored (outside any group)
 *  - an EMPTY Allow/Disallow value matches nothing (§2.2.2) and is dropped
 *    here — the LIKE translation downstream would otherwise read "" as
 *    match-everything
 *  - user agents are lowercased (the filter's group selection is
 *    case-insensitive)
 */
object RobotsParseUtil {

  /** (user_agent, rule_type, path_prefix) triples in file order. */
  def parse(body: String): Seq[(String, String, String)] = {
    val out = ArrayBuffer.empty[(String, String, String)]
    var group = List.empty[String]
    var lastWasRule = false
    // BOM stripped (a BOM-prefixed 'User-agent' would read as an unknown
    // directive and silently drop the whole group — failing OPEN); §2.1
    // allows bare-CR line terminators, so split on all three conventions
    val noBom = if (body.startsWith("\uFEFF")) body.substring(1) else body
    noBom.split("\r\n|\r|\n", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (lastWasRule) { group = Nil; lastWasRule = false }
              if (value.nonEmpty) group = group :+ value.toLowerCase
            case "allow" | "disallow" =>
              if (group.nonEmpty) {
                lastWasRule = true
                if (value.nonEmpty) group.foreach(ua => out += ((ua, key, value)))
              }
            case "crawl-delay" =>
              // de-facto extension (not RFC 9309, but widely served): kept
              // as a group-scoped row so Scheduler.crawlDelays can budget
              // politeness; non-numeric values dropped
              if (group.nonEmpty) {
                lastWasRule = true
                if (value.nonEmpty && value.forall(c => c.isDigit))
                  group.foreach(ua => out += ((ua, key, value)))
              }
            case _ => // unknown directive: ignored, does not break the group
          }
        }
      }
    }
    out.toSeq
  }

  def parseToArrayData(body: UTF8String): ArrayData =
    new GenericArrayData(parse(body.toString).map { case (ua, t, p) =>
      InternalRow(UTF8String.fromString(ua), UTF8String.fromString(t),
        UTF8String.fromString(p))
    }.toArray[Any])
}

/** `robots_rules(body)` -> array<struct<user_agent,rule_type,path_prefix>>. */
case class RobotsRules(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("user_agent", StringType),
    StructField("rule_type", StringType),
    StructField("path_prefix", StringType))))
  override def nullSafeEval(v: Any): Any =
    RobotsParseUtil.parseToArrayData(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RobotsParseUtil.parseToArrayData($c);")
  override protected def withNewChildInternal(newChild: Expression): RobotsRules =
    copy(child = newChild)
  override def prettyName: String = "robots_rules"
}

object RobotsRules {
  def robots_rules(c: Column): Column = Bridge.column(RobotsRules(Bridge.expression(c)))
}
