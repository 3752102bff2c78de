package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * RFC 3986 URL canonicalization (syntax-based normalization, RFC 3986 §6.2.2
 * + scheme-based default-port elision §6.2.3). Semantics consistent with the
 * reference's absolute-URI reconstruction `parseRequestTargetURI`
 * (/root/reference/dialer.go:863-932), which is idempotent on absolute URIs;
 * `canonicalize` is idempotent by construction (property-tested).
 *
 * Rules: lowercase scheme + host; strip fragment; strip default port
 * (http:80, https:443); remove dot-segments; empty path -> "/"; decode
 * percent-encoded unreserved chars; uppercase remaining percent triplets;
 * strip a lone trailing host dot. Query order is preserved (reordering
 * changes semantics).
 */
object UrlCanon {

  def canonicalize(u: UTF8String): UTF8String = UTF8String.fromString(canonicalize(u.toString))

  def canonicalize(raw: String): String = {
    val url = raw.trim
    if (url.isEmpty) return url
    // fragment off first
    val noFrag = { val h = url.indexOf('#'); if (h >= 0) url.substring(0, h) else url }
    val schemeEnd = noFrag.indexOf("://")
    val (scheme, rest) =
      if (schemeEnd > 0 && noFrag.substring(0, schemeEnd).forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
        (noFrag.substring(0, schemeEnd).toLowerCase, noFrag.substring(schemeEnd + 3))
      else ("http", noFrag) // schemeless input: treat as authority-first (crawl seeds)
    // authority = up to first '/', '?' (no fragment left)
    var authEnd = rest.length
    var i = 0
    var found = false
    while (i < rest.length && !found) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') { authEnd = i; found = true }
      i += 1
    }
    val authority = rest.substring(0, authEnd)
    val pathAndQuery = rest.substring(authEnd)
    // userinfo split
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    val hostPort = if (at >= 0) authority.substring(at + 1) else authority
    // port split (IPv6 [..] aware)
    val (host0, port) =
      if (hostPort.startsWith("[")) {
        val close = hostPort.indexOf(']')
        if (close >= 0 && close + 1 < hostPort.length && hostPort.charAt(close + 1) == ':')
          (hostPort.substring(0, close + 1), hostPort.substring(close + 2))
        else (hostPort, "")
      } else {
        val colon = hostPort.lastIndexOf(':')
        if (colon >= 0) (hostPort.substring(0, colon), hostPort.substring(colon + 1))
        else (hostPort, "")
      }
    var host = host0.toLowerCase
    if (host.length > 1 && host.endsWith(".")) host = host.substring(0, host.length - 1)
    val defaultPort = scheme match {
      case "http" => "80"; case "https" => "443"; case "ftp" => "21"; case _ => ""
    }
    val portPart =
      if (port.isEmpty || port == defaultPort || !port.forall(_.isDigit)) ""
      else ":" + port
    val qIdx = pathAndQuery.indexOf('?')
    val rawPath = if (qIdx >= 0) pathAndQuery.substring(0, qIdx) else pathAndQuery
    val rawQuery = if (qIdx >= 0) pathAndQuery.substring(qIdx + 1) else null
    val path = removeDotSegments(normalizePercent(rawPath)) match {
      case "" => "/"
      case p if !p.startsWith("/") => "/" + p
      case p => p
    }
    val query = if (rawQuery == null) "" else "?" + normalizePercent(rawQuery)
    scheme + "://" + userinfo + host + portPart + path + query
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode %XX for unreserved chars; uppercase remaining triplets (RFC 3986 §6.2.2.1-2). */
  def normalizePercent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (v < 128 && isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1))).append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    if (path.indexOf('.') < 0) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        val seg = if (next >= 0) in.substring(0, next) else in
        out += seg
        in = if (next >= 0) in.substring(next) else ""
      }
    }
    out.mkString
  }

  /** Registrable host extraction on canonical form (cf. extract.go:160-171). */
  def hostOf(url: String): String = {
    val c = canonicalize(url)
    val s = c.indexOf("://")
    if (s < 0) return ""
    val rest = c.substring(s + 3)
    val at = { val a = rest.indexOf('/'); if (a >= 0) rest.substring(0, a) else rest }
    val noUser = { val u = at.lastIndexOf('@'); if (u >= 0) at.substring(u + 1) else at }
    val colon = noUser.lastIndexOf(':')
    if (colon > noUser.lastIndexOf(']')) noUser.substring(0, colon) else noUser
  }
}

/** `url_canonicalize(url)` as a whole-stage-codegen-friendly expression. */
case class UrlCanonicalize(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = UrlCanon.canonicalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.UrlCanon.canonicalize($c);")
  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
  override def prettyName: String = "url_canonicalize"
}

object UrlCanonicalize {
  def url_canonicalize(c: Column): Column =
    Bridge.column(UrlCanonicalize(Bridge.expression(c)))
}
