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

  /** RFC 3986 appendix-B component split: (scheme, authority, path, query,
    * fragment); `authority`/`query`/`fragment` are null when ABSENT (the
    * present-but-empty distinction matters in §5.2.2: `?` keeps an empty
    * query, no `?` inherits the base's). Scheme is validated per §3.1
    * (ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )); a colon-bearing first
    * segment that fails it (e.g. `1:2`) is path, matching strict parsers. */
  private[functions] def splitUri(u: String): (String, String, String, String, String) = {
    var rest = u
    var fragment: String = null
    val h = rest.indexOf('#')
    if (h >= 0) { fragment = rest.substring(h + 1); rest = rest.substring(0, h) }
    var query: String = null
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    var scheme: String = null
    val c = rest.indexOf(':')
    if (c > 0) {
      val cand = rest.substring(0, c)
      val slash = rest.indexOf('/')
      // RFC 3986 §3.1: scheme = ASCII ALPHA *(ALPHA / DIGIT / "+" / "-" /
      // "."). Unicode-aware isLetter accepted e.g. 'é:x' as a scheme
      // (round-7 ADVICE), contradicting the strict-parser contract.
      def asciiAlpha(ch: Char) = (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')
      val validChars = asciiAlpha(cand.charAt(0)) &&
        cand.forall(ch => asciiAlpha(ch) || (ch >= '0' && ch <= '9') ||
          ch == '+' || ch == '-' || ch == '.')
      if (validChars && (slash < 0 || c < slash)) { scheme = cand; rest = rest.substring(c + 1) }
    }
    var authority: String = null
    if (rest.startsWith("//")) {
      var end = rest.length
      var i = 2
      while (i < rest.length && end == rest.length) {
        if (rest.charAt(i) == '/') end = i
        i += 1
      }
      authority = rest.substring(2, end)
      rest = rest.substring(end)
    }
    (scheme, authority, rest, query, fragment)
  }

  /** RFC 3986 §5.2.3 merge: base-with-authority-and-empty-path prefixes "/";
    * otherwise the reference path replaces everything after the base path's
    * last "/". */
  private def mergePaths(baseAuth: String, basePath: String, refPath: String): String =
    if (baseAuth != null && basePath.isEmpty) "/" + refPath
    else {
      val cut = basePath.lastIndexOf('/')
      if (cut < 0) refPath else basePath.substring(0, cut + 1) + refPath
    }

  def resolve(base: UTF8String, ref: UTF8String): UTF8String =
    UTF8String.fromString(resolve(base.toString, ref.toString))

  /** RFC 3986 §5.2.2 strict reference resolution (transform references).
    * Returns the target URI WITH any fragment — fragment stripping belongs to
    * `canonicalize`, which is the crawl's next step. Passes every §5.4.1
    * normal and §5.4.2 abnormal example (UrlResolveSpec). The reference
    * engine resolves discovered links the same way before queueing
    * (semantics per its absolute-URI reconstruction, dialer.go:863-932). */
  def resolve(baseRaw: String, refRaw: String): String = {
    val base = baseRaw.trim
    val ref = refRaw.trim
    val (rScheme, rAuth, rPath0, rQuery, rFragment) = splitUri(ref)
    val (bScheme, bAuth, bPath, bQuery, _) = splitUri(base)
    var tScheme: String = null; var tAuth: String = null
    var tPath: String = null; var tQuery: String = null
    if (rScheme != null) {
      tScheme = rScheme; tAuth = rAuth
      tPath = removeDotSegments(rPath0); tQuery = rQuery
    } else {
      if (rAuth != null) {
        tAuth = rAuth; tPath = removeDotSegments(rPath0); tQuery = rQuery
      } else {
        if (rPath0.isEmpty) {
          tPath = bPath
          tQuery = if (rQuery != null) rQuery else bQuery
        } else {
          tPath =
            if (rPath0.startsWith("/")) removeDotSegments(rPath0)
            else removeDotSegments(mergePaths(bAuth, bPath, rPath0))
          tQuery = rQuery
        }
        tAuth = bAuth
      }
      tScheme = bScheme
    }
    val sb = new java.lang.StringBuilder(base.length + ref.length)
    if (tScheme != null) sb.append(tScheme).append(':')
    if (tAuth != null) sb.append("//").append(tAuth)
    sb.append(if (tPath == null) "" else tPath)
    if (tQuery != null) sb.append('?').append(tQuery)
    if (rFragment != null) sb.append('#').append(rFragment)
    sb.toString
  }

  def surt(u: UTF8String): UTF8String = UTF8String.fromString(surt(u.toString))

  /** SURT key (Sort-friendly URI Reordering Transform, the Internet
    * Archive's public CDX url-key convention): canonicalize, drop the
    * scheme + userinfo, reverse the host labels comma-joined (so one
    * registrable domain's URLs sort contiguously — the property a 100 TB
    * sorted CDX index needs), keep a non-default port, then `)` + path +
    * query. IPv4 and bracketed IPv6 literals are not label-reversed (the
    * public surt library's convention). `http://www.example.com/p?q=1` →
    * `com,example,www)/p?q=1`. */
  def surt(raw: String): String = {
    val c = canonicalize(raw)
    val s = c.indexOf("://")
    if (s < 0) return c
    val rest = c.substring(s + 3)
    val slash = rest.indexOf('/')
    val auth = if (slash >= 0) rest.substring(0, slash) else rest
    val pathq = if (slash >= 0) rest.substring(slash) else "/"
    val noUser = { val u = auth.lastIndexOf('@'); if (u >= 0) auth.substring(u + 1) else auth }
    val (host, port) =
      if (noUser.startsWith("[")) {
        val close = noUser.indexOf(']')
        if (close >= 0 && close + 1 < noUser.length && noUser.charAt(close + 1) == ':')
          (noUser.substring(0, close + 1), noUser.substring(close + 1))
        else (noUser, "")
      } else {
        val colon = noUser.lastIndexOf(':')
        if (colon >= 0) (noUser.substring(0, colon), noUser.substring(colon))
        else (noUser, "")
      }
    val isIpv4 = host.nonEmpty && host.forall(ch => ch.isDigit || ch == '.') &&
      host.count(_ == '.') == 3
    val key =
      if (isIpv4 || host.startsWith("[")) host
      else host.split('.').reverse.mkString(",")
    key + port + ")" + pathq
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

/** `url_resolve(base, ref)` — RFC 3986 §5.2 reference resolution as a
  * whole-stage-codegen-friendly expression (the link-discovery hot path:
  * one call per extracted href over every fetched page). */
case class UrlResolve(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(base: Any, ref: Any): Any =
    UrlCanon.resolve(base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) =>
      s"${ev.value} = graft.functions.UrlCanon.resolve($b, $r);")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): UrlResolve =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "url_resolve"
}

object UrlResolve {
  def url_resolve(base: Column, ref: Column): Column =
    Bridge.column(UrlResolve(Bridge.expression(base), Bridge.expression(ref)))
}

/** `surt_key(url)` — the sort-friendly CDX url key as a codegen expression. */
case class SurtKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = UrlCanon.surt(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.UrlCanon.surt($c);")
  override protected def withNewChildInternal(newChild: Expression): SurtKey =
    copy(child = newChild)
  override def prettyName: String = "surt_key"
}

object SurtKey {
  def surt_key(c: Column): Column = Bridge.column(SurtKey(Bridge.expression(c)))
}
