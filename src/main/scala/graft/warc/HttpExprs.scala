package graft.warc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/**
 * HTTP-message column expressions (X1-X3, P3 in SURVEY §2) — pure
 * `functions._` compositions, whole-stage-codegen'd.
 */
object HttpExprs {

  /** The nine request methods the reference recognizes (utils.go:26-40). */
  val Methods: Seq[String] = Seq("GET", "HEAD", "POST", "PUT", "DELETE",
    "CONNECT", "OPTIONS", "TRACE", "PATCH")

  /** P3: request-line detector — prefix ∈ methods ∧ suffix ∈ {HTTP/1.0, HTTP/1.1}. */
  def isHttpRequest(line: Column): Column =
    Methods.map(m => line.startsWith(m + " ")).reduce(_ || _) &&
      (line.endsWith(" HTTP/1.0") || line.endsWith(" HTTP/1.1"))

  /** X3: status code from an HTTP response block ("HTTP/1.1 200 OK...");
    * null on non-HTTP content (ANSI-safe: no cast of the empty no-match). */
  def parseStatus(content: Column): Column = {
    val m = regexp_extract(content, "^HTTP/1\\.[01] (\\d{3})", 1)
    when(m === "", lit(null).cast("int")).otherwise(m.cast("int"))
  }

  /** X3/P1: case-insensitive header value from a raw HTTP block. */
  def parseHttpHeader(content: Column, key: String): Column = {
    // (?i) case-insensitive, (?m) ^ matches at line starts; value up to CR
    regexp_extract(content, "(?im)^" + java.util.regex.Pattern.quote(key) + ":\\s*([^\r\n]*)", 1)
  }

  /** X1: absolute target URI from request line + Host header (dialer.go:863-932).
    * Idempotent: an already-absolute request-target passes through. */
  def targetUri(requestBlock: Column, scheme: String = "http"): Column = {
    val target = regexp_extract(requestBlock, "^[A-Z]+ (\\S+) HTTP", 1)
    val host = parseHttpHeader(requestBlock, "Host")
    when(target.rlike("^[a-z]+://"), target)
      .otherwise(concat(lit(scheme + "://"), host, target))
  }

  /** X2: 1-based offset just past the first \r\n\r\n (end-of-headers cut). */
  def endOfHeadersOffset(content: Column): Column = {
    val p = locate("\r\n\r\n", content)
    when(p === 0, lit(-1)).otherwise(p + 4)
  }

  /** HTTP message body: the BYTES after the first \r\n\r\n of a binary HTTP
    * block; null when no header terminator exists. Byte-exact (a UTF-8 cast
    * would mangle arbitrary payload bytes), codegen'd — this is the cut the
    * payload-digest verification recomputes over (verify.go:125-187). */
  def http_payload(content: Column): Column =
    Bridge.column(HttpPayload(Bridge.expression(content)))

  /** Headers-only block: bytes up to and including the first CRLFCRLF (the
    * revisit truncation cut), null when not an HTTP block. Byte-exact. */
  def http_head(content: Column): Column =
    Bridge.column(HttpHead(Bridge.expression(content)))
}

object HttpPayloadUtil {
  /** Bytes after the first CRLFCRLF, or null if absent (not an HTTP block). */
  def payload(b: Array[Byte]): Array[Byte] = {
    var i = 0
    val n = b.length - 3
    while (i < n) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(b, i + 4, b.length)
      i += 1
    }
    null
  }

  /** The complement of [[payload]]: bytes up to AND INCLUDING the first
    * CRLFCRLF (the headers-only block a revisit record stores), or null if
    * absent. `head(b) ++ payload(b) == b` whenever both are non-null. */
  def head(b: Array[Byte]): Array[Byte] = {
    var i = 0
    val n = b.length - 3
    while (i < n) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(b, 0, i + 4)
      i += 1
    }
    null
  }
}

/** `http_head(binary) -> binary`: see [[HttpPayloadUtil.head]]. */
case class HttpHead(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HttpPayloadUtil.head(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.warc.HttpPayloadUtil.head($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): HttpHead =
    copy(child = newChild)
  override def prettyName: String = "http_head"
}

/** `http_payload(binary) -> binary`: see [[HttpExprs.http_payload]]. */
case class HttpPayload(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HttpPayloadUtil.payload(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.warc.HttpPayloadUtil.payload($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): HttpPayload =
    copy(child = newChild)
  override def prettyName: String = "http_payload"
}
