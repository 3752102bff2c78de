package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * WARC digest strings in the reference's `algo:encoded` format
 * (cf. /root/reference/digest.go:49-88): SHA-1 -> Base32, SHA-256 -> Base32 or
 * lowercase hex. Spark's built-in `sha1`/`sha2` return hex only, so Base32
 * encodings need a custom expression. Implemented as a codegen-friendly
 * `UnaryExpression` (static helper call inside whole-stage codegen).
 */
object DigestUtil {
  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567".toCharArray
  private val HEX = "0123456789abcdef".toCharArray

  /** RFC 4648 Base32 with '=' padding (matches Go's base32.StdEncoding). */
  def base32(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(((bytes.length + 4) / 5) * 8)
    var i = 0
    while (i < bytes.length) {
      val n = math.min(5, bytes.length - i)
      var buf = 0L
      var j = 0
      while (j < 5) { buf = (buf << 8) | (if (j < n) bytes(i + j) & 0xffL else 0L); j += 1 }
      val chars = (n * 8 + 4) / 5
      var k = 0
      while (k < 8) {
        if (k < chars) sb.append(B32(((buf >>> (35 - 5 * k)) & 31).toInt))
        else sb.append('=')
        k += 1
      }
      i += 5
    }
    sb.toString
  }

  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private def md(algo: String) = java.security.MessageDigest.getInstance(algo)

  /** `algo` is one of sha1 | sha256b32 | sha256 (hex) | blake3. Used from generated code. */
  def digest(data: Array[Byte], algo: String): UTF8String = {
    val s = algo match {
      case "sha1"      => "sha1:" + base32(md("SHA-1").digest(data))
      case "sha256b32" => "sha256:" + base32(md("SHA-256").digest(data))
      case "sha256"    => "sha256:" + hex(md("SHA-256").digest(data))
      case "blake3"    => "blake3:" + hex(Blake3.hash(data)) // digest.go:73-76 format
      case other       => throw new IllegalArgumentException(s"unknown digest algo: $other")
    }
    UTF8String.fromString(s)
  }

  def digestStr(data: UTF8String, algo: String): UTF8String = digest(data.getBytes, algo)
}

/**
 * `warc_digest(col, algo)`: digest of a string/binary column in gowarc's
 * prefixed format. Algo is fixed at plan time (the reference dispatches on a
 * config enum, digest.go:15-23) so codegen inlines a constant.
 */
case class WarcDigest(child: Expression, algo: String)
    extends UnaryExpression {
  require(Set("sha1", "sha256b32", "sha256", "blake3").contains(algo), s"bad algo $algo")
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String  => DigestUtil.digestStr(s, algo)
    case b: Array[Byte] => DigestUtil.digest(b, algo)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val call =
        if (child.dataType == StringType) s"graft.functions.DigestUtil.digestStr($c, \"$algo\")"
        else s"graft.functions.DigestUtil.digest($c, \"$algo\")"
      s"${ev.value} = $call;"
    })
  override protected def withNewChildInternal(newChild: Expression): WarcDigest =
    copy(child = newChild)
  override def prettyName: String = "warc_digest"
}

object WarcDigest {
  /** The four payload digests exempt from dedup (reference dialer.go:84-89). */
  val EmptyDigests: Seq[String] = Seq(
    "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ",
    "sha256:4OYMIQUY7QOBJGX36TEJS35ZEQT24QPEMSNZGTFESWMRW6CSXBKQ====",
    "sha256:e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
    "blake3:af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")

  def warc_sha1_b32(c: Column): Column =
    Bridge.column(WarcDigest(Bridge.expression(c), "sha1"))
  def warc_sha256_b32(c: Column): Column =
    Bridge.column(WarcDigest(Bridge.expression(c), "sha256b32"))
  def warc_sha256_hex(c: Column): Column =
    Bridge.column(WarcDigest(Bridge.expression(c), "sha256"))
  def warc_blake3(c: Column): Column =
    Bridge.column(WarcDigest(Bridge.expression(c), "blake3"))
}
