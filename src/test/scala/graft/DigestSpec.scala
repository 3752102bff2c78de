package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DigestUtil

/**
 * Golden digest values verbatim from the reference's table-driven tests
 * (/root/reference/digest_test.go:10-148) — algorithm-defined, so they must
 * match exactly.
 */
class DigestSpec extends AnyFunSuite {
  private val hello = "hello world".getBytes("UTF-8")
  private val empty = Array.empty[Byte]

  test("sha1 base32 of 'hello world' (digest_test.go:11)") {
    assert(DigestUtil.digest(hello, "sha1").toString ==
      "sha1:FKXGYNOJJ7H3IFO35FPUBC445EPOQRXN")
  }
  test("sha1 base32 of empty payload (digest_test.go:34, dialer.go:85)") {
    assert(DigestUtil.digest(empty, "sha1").toString ==
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
  }
  test("sha256 base32 of 'hello world' (digest_test.go:45)") {
    assert(DigestUtil.digest(hello, "sha256b32").toString ==
      "sha256:XFGSPOMTJU7ARJJOKLL5U7NL7LCIJ37DPJJYB3UQRD32ZYXPZXUQ====")
  }
  test("sha256 hex of 'hello world' (digest_test.go:81)") {
    assert(DigestUtil.digest(hello, "sha256").toString ==
      "sha256:b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
  }
  test("sha256 of empty payload, both encodings (digest_test.go:70,106)") {
    assert(DigestUtil.digest(empty, "sha256b32").toString ==
      "sha256:4OYMIQUY7QOBJGX36TEJS35ZEQT24QPEMSNZGTFESWMRW6CSXBKQ====")
    assert(DigestUtil.digest(empty, "sha256").toString ==
      "sha256:e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }
  test("base32 padding across residue classes vs java.util reference impl") {
    // cross-check our Base32 against an independent implementation
    for (len <- 0 to 40) {
      val data = Array.tabulate(len)(i => ((i * 37 + 11) % 251).toByte)
      val expected = {
        // independent oracle: BigInteger-based RFC 4648 encoder
        val bits = data.flatMap(b => (7 to 0 by -1).map(i => (b >> i) & 1))
        val groups = bits.grouped(5).map(g => g.padTo(5, 0).foldLeft(0)((a, b) => (a << 1) | b)).toArray
        val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
        val chars = groups.map(alphabet(_)).mkString
        val padTo = ((chars.length + 7) / 8) * 8
        chars.padTo(padTo, '=')
      }
      assert(DigestUtil.base32(data) == expected, s"len=$len")
    }
  }
}
