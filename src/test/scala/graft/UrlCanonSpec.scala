package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.UrlCanon

/**
 * RFC 3986 canonicalization: goldens + the idempotence property the
 * reference's URI reconstruction exhibits (dialer.go:927-931 returns the
 * input unchanged when already absolute).
 */
class UrlCanonSpec extends AnyFunSuite with GenHelpers {

  private val golden = Seq(
    // reference golden (dialer_test.go:10-66): request-line + Host -> absolute
    "http://example.com/index.html" -> "http://example.com/index.html",
    // case normalization (RFC 3986 §6.2.2.1)
    "HTTP://EXAMPLE.COM/Path" -> "http://example.com/Path",
    "HTTP://User@Example.COM/" -> "http://User@example.com/",
    // default port elision (§6.2.3)
    "http://example.com:80/" -> "http://example.com/",
    "https://example.com:443/x" -> "https://example.com/x",
    "http://example.com:8080/x" -> "http://example.com:8080/x",
    // empty path -> "/"
    "http://example.com" -> "http://example.com/",
    "http://example.com?q=1" -> "http://example.com/?q=1",
    // dot segments (§5.2.4)
    "http://example.com/a/./b" -> "http://example.com/a/b",
    "http://example.com/a/../b" -> "http://example.com/b",
    "http://example.com/../x" -> "http://example.com/x",
    "http://example.com/a/b/../../c" -> "http://example.com/c",
    // percent normalization (§6.2.2.1-2): decode unreserved, uppercase rest
    "http://example.com/%70ath" -> "http://example.com/path",
    "http://example.com/a%2fb" -> "http://example.com/a%2Fb",
    "http://example.com/%7Euser" -> "http://example.com/~user",
    // fragment stripped
    "http://example.com/x#frag" -> "http://example.com/x",
    // trailing host dot
    "http://example.com./x" -> "http://example.com/x",
    // schemeless seeds
    "example.com/x" -> "http://example.com/x",
    // query preserved in order
    "http://example.com/x?b=2&a=1" -> "http://example.com/x?b=2&a=1",
    // ipv6 authority
    "http://[2001:DB8::1]:80/x" -> "http://[2001:db8::1]/x",
    "http://[2001:DB8::1]:8443/x" -> "http://[2001:db8::1]:8443/x")

  test("canonicalization goldens") {
    golden.foreach { case (in, want) =>
      assert(UrlCanon.canonicalize(in) == want, s"input: $in")
    }
  }

  test("synthetic-web seed variants collapse to the base url") {
    val base = "http://host7.example/p123"
    assert(UrlCanon.canonicalize("HTTP://HOST7.EXAMPLE/p123") == base)
    assert(UrlCanon.canonicalize("http://host7.example:80/p123") == base)
    assert(UrlCanon.canonicalize("http://host7.example/a/../p123") == base)
    assert(UrlCanon.canonicalize("http://host7.example/%70123") == base)
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HtTpS")
    host <- Gen.oneOf("Example.COM", "a.b.c", "host0.example", "xn--test.de.",
      "[2001:db8::1]")
    port <- Gen.oneOf("", ":80", ":443", ":8080", ":1")
    path <- Gen.oneOf("", "/", "/a/b", "/a/./b", "/a/../b", "/../..", "/%61%2F%7e",
      "/a//b", "/p1/./../p2")
    query <- Gen.oneOf("", "?x=%41", "?b=2&a=1", "?%7e")
    frag <- Gen.oneOf("", "#f", "#a/b?c")
  } yield s"$scheme://$host$port$path$query$frag"

  test("canonicalize is idempotent (property)") {
    checkAll(urlGen, n = 500) { u =>
      val once = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(once) == once, s"not idempotent for $u -> $once")
    }
  }

  test("hostOf extracts the lowercased registrable host") {
    assert(UrlCanon.hostOf("HTTP://User@Example.COM:8080/x") == "example.com")
    assert(UrlCanon.hostOf("http://[2001:DB8::1]:8443/x") == "[2001:db8::1]")
    assert(UrlCanon.hostOf("host3.example/p9") == "host3.example")
  }

  test("remove_dot_segments matches RFC 3986 §5.2.4 examples") {
    assert(UrlCanon.removeDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(UrlCanon.removeDotSegments("mid/content=5/../6") == "mid/6")
  }
}
