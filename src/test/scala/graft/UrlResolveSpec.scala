package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.UrlCanon
import graft.ops.TextOps

/** RFC 3986 §5.2 reference resolution: the OFFICIAL §5.4.1 normal and
  * §5.4.2 abnormal example tables as spec-derived goldens (the same
  * independent-golden pattern as Blake3Spec's spec vectors), plus the
  * link-extraction surface and the crawl wiring. */
class UrlResolveSpec extends SparkSpec with GenHelpers {

  private val Base = "http://a/b/c/d;p?q"

  // RFC 3986 §5.4.1 — normal examples, verbatim
  private val normal = Seq(
    "g:h" -> "g:h",
    "g" -> "http://a/b/c/g",
    "./g" -> "http://a/b/c/g",
    "g/" -> "http://a/b/c/g/",
    "/g" -> "http://a/g",
    "//g" -> "http://g",
    "?y" -> "http://a/b/c/d;p?y",
    "g?y" -> "http://a/b/c/g?y",
    "#s" -> "http://a/b/c/d;p?q#s",
    "g#s" -> "http://a/b/c/g#s",
    "g?y#s" -> "http://a/b/c/g?y#s",
    ";x" -> "http://a/b/c/;x",
    "g;x" -> "http://a/b/c/g;x",
    "g;x?y#s" -> "http://a/b/c/g;x?y#s",
    "" -> "http://a/b/c/d;p?q",
    "." -> "http://a/b/c/",
    "./" -> "http://a/b/c/",
    ".." -> "http://a/b/",
    "../" -> "http://a/b/",
    "../g" -> "http://a/b/g",
    "../.." -> "http://a/",
    "../../" -> "http://a/",
    "../../g" -> "http://a/g")

  // RFC 3986 §5.4.2 — abnormal examples, verbatim (incl. the strict-parser
  // "http:g" answer, which the RFC says strict parsers MUST produce)
  private val abnormal = Seq(
    "../../../g" -> "http://a/g",
    "../../../../g" -> "http://a/g",
    "/./g" -> "http://a/g",
    "/../g" -> "http://a/g",
    "g." -> "http://a/b/c/g.",
    ".g" -> "http://a/b/c/.g",
    "g.." -> "http://a/b/c/g..",
    "..g" -> "http://a/b/c/..g",
    "./../g" -> "http://a/b/g",
    "./g/." -> "http://a/b/c/g/",
    "g/./h" -> "http://a/b/c/g/h",
    "g/../h" -> "http://a/b/c/h",
    "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a/b/c/y",
    "g?y/./x" -> "http://a/b/c/g?y/./x",
    "g?y/../x" -> "http://a/b/c/g?y/../x",
    "g#s/./x" -> "http://a/b/c/g#s/./x",
    "g#s/../x" -> "http://a/b/c/g#s/../x",
    "http:g" -> "http:g")

  test("RFC 3986 §5.4.1 normal examples") {
    normal.foreach { case (ref, want) =>
      assert(UrlCanon.resolve(Base, ref) === want, s"ref <$ref>")
    }
  }

  test("RFC 3986 §5.4.2 abnormal examples") {
    abnormal.foreach { case (ref, want) =>
      assert(UrlCanon.resolve(Base, ref) === want, s"ref <$ref>")
    }
  }

  test("resolution of an absolute reference is the reference itself (any base)") {
    val absGen = for {
      host <- Gen.alphaLowerStr.suchThat(_.nonEmpty)
      path <- Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.take(4))
      q <- Gen.option(Gen.alphaNumStr)
    } yield s"http://$host/${path.mkString("/")}" + q.map("?" + _).getOrElse("")
    checkAll(absGen, 200) { abs =>
      assert(UrlCanon.resolve(Base, abs) === abs)
    }
  }

  test("resolve then canonicalize = canonical target (composition the crawl uses)") {
    // fragment-bearing refs: resolve keeps the fragment, canonicalize strips it
    assert(UrlCanon.canonicalize(UrlCanon.resolve(Base, "g#s")) === "http://a/b/c/g")
    assert(UrlCanon.canonicalize(UrlCanon.resolve("HTTP://A:80/b/", "../X%41")) === "http://a/XA")
  }

  test("url_resolve expression matches the Scala function on a battery") {
    import graft.functions.UrlResolve.url_resolve
    val refs = (normal ++ abnormal).map(_._1)
    val df = spark.createDataFrame(refs.map(Tuple1(_))).toDF("ref")
      .select(col("ref"), url_resolve(lit(Base), col("ref")).as("got"))
    df.collect().foreach { r =>
      assert(r.getString(1) === UrlCanon.resolve(Base, r.getString(0)), s"ref <${r.getString(0)}>")
    }
  }

  test("extractLinks: document order, both quote styles, href and src") {
    val html = """<html><head><base href="/b/"><link rel=stylesheet href="style.css">
      |<script src='app.js'></script></head>
      |<body><a href="one.html">1</a><A HREF='two.html'>2</A>
      |<img src="pic.png"/><a href="mailto:x@y.z">m</a>
      |<a href="javascript:void(0)">j</a><a href="">empty</a></body>""".stripMargin
    val got = spark.range(1).select(TextOps.extractLinks(lit(html)).as("l"))
      .selectExpr("explode(l) as r").collect().map(_.getString(0)).toSeq
    assert(got === Seq("/b/", "style.css", "app.js", "one.html", "two.html",
      "pic.png", "mailto:x@y.z", "javascript:void(0)", ""))
    // the non-fetchable filter drops the junk the frontier can't dereference
    val kept = got.filter(r => r.nonEmpty && !java.util.regex.Pattern.compile(
      TextOps.NonFetchableLinkPattern.replace("\\A", "^")).matcher(r).find())
    assert(kept === Seq("/b/", "style.css", "app.js", "one.html", "two.html", "pic.png"))
  }

  test("outlinksFromHtml: resolve against page URI, honour <base href>, canonicalize, dedup per page") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("url_key", StringType), StructField("status", IntegerType),
      StructField("priority", IntegerType), StructField("depth", IntegerType),
      StructField("payload", StringType)))
    val rows = Seq(
      Row("http://site.example/dir/page.html", 200, 1, 0,
        """<a href="a.html">x</a><a href="../up.html">y</a>
          |<a href="/abs.html">z</a><a href="//cdn.example/l.js">c</a>
          |<a href="HTTP://Other.Example:80/P#frag">o</a>
          |<a href="a.html">dup</a><a href="mailto:x@y">m</a>""".stripMargin),
      Row("http://site.example/dir/based.html", 200, 1, 0,
        """<base href="/deep/nest/"><a href="rel.html">r</a>"""),
      Row("http://site.example/gone.html", 404, 1, 0, """<a href="never.html">n</a>"""))
    val fetched = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = graft.fetch.Fetch.outlinksFromHtml(fetched,
      graft.fetch.Fetch.Config(round = 1, roundEpoch = 1700000000L, parseLinks = true))
    val got = out.select("url", "via", "depth").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(
      ("http://site.example/dir/a.html", "http://site.example/dir/page.html", 1),
      ("http://site.example/up.html", "http://site.example/dir/page.html", 1),
      ("http://site.example/abs.html", "http://site.example/dir/page.html", 1),
      ("http://cdn.example/l.js", "http://site.example/dir/page.html", 1),
      ("http://other.example/P", "http://site.example/dir/page.html", 1),
      ("http://site.example/deep/nest/rel.html", "http://site.example/dir/based.html", 1)))
    // per-page dedup: the duplicated a.html yields ONE frontier row
    assert(out.count() === 6)
  }
}
