package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.functions._

import graft.functions.UrlCanon
import graft.sources.WarcSink

/** CDX index generation: SURT keys, sortedness, and — the index's whole
  * point — RANDOM ACCESS: every (filename, offset, length) triple must
  * gunzip to exactly its indexed record. */
class CdxIndexSpec extends SparkSpec {

  test("SURT goldens (public surt convention)") {
    val golden = Seq(
      "http://www.archive.org/" -> "org,archive,www)/",
      "https://example.com/path?q=1" -> "com,example)/path?q=1",
      "HTTP://EXAMPLE.COM:8080/A/../B" -> "com,example:8080)/B",
      "http://user@sub.Example.Com/x" -> "com,example,sub)/x",
      "http://10.0.0.1/x" -> "10.0.0.1)/x",
      "http://example.com" -> "com,example)/")
    golden.foreach { case (in, want) => assert(UrlCanon.surt(in) === want, s"surt($in)") }
    // sort-contiguity: one domain's subdomains cluster under its reversed prefix
    val keys = Seq("http://a.example.com/1", "http://b.example.com/2",
      "http://example.com/3").map(UrlCanon.surt).sorted
    assert(keys.forall(_.startsWith("com,example")))
  }

  private def responses(n: Int) = {
    spark.range(n).select(
      lit("WARC/1.1").as("version"),
      map(
        lit("WARC-Record-ID"), concat(lit("<urn:uuid:rec"), col("id").cast("string"), lit(">")),
        lit("WARC-Type"), lit("response"),
        lit("WARC-Target-URI"), concat(lit("http://h"), (col("id") % 5).cast("string"),
          lit(".example/p"), col("id").cast("string")),
        lit("WARC-Date"), lit("2023-11-14T22:13:20Z")).as("headers"),
      concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\nbody "),
        col("id").cast("string")).cast("binary").as("content"))
  }

  test("CDX lines: fields, sortedness, and random-access replay of every member") {
    val warcDir = Files.createTempDirectory("cdx-src").toString
    WarcSink.write(responses(40), warcDir, maxRecordsPerFile = 15, gzip = true)

    val idx = graft.jobs.CdxIndex.lines(spark, warcDir).cache()
    val rows = idx.collect()
    assert(rows.length === 40)

    // field shape
    rows.foreach { r =>
      assert(r.getAs[String]("timestamp") === "20231114221320")
      assert(r.getAs[String]("mimetype") === "text/html")
      assert(r.getAs[String]("statuscode") === "200")
      assert(r.getAs[String]("urlkey").matches("example,h[0-4]\\)/p\\d+"))
      assert(r.getAs[String]("cdx_line").split(" ").length === 11)
    }

    // sorted within every partition (the binary-searchable contract)
    val perPart = idx.select(spark_partition_id().as("p"), col("urlkey"), col("timestamp"))
      .collect().groupBy(_.getInt(0))
    perPart.values.foreach { part =>
      val ks = part.map(r => (r.getString(1), r.getString(2))).toSeq
      assert(ks === ks.sorted)
    }

    // RANDOM ACCESS: gunzip each indexed member slice, find its record inside
    rows.foreach { r =>
      val file = Files.list(Paths.get(warcDir)).filter(_.getFileName.toString == r.getAs[String]("filename"))
        .findFirst().orElseThrow()
      val off = r.getAs[String]("offset").toLong
      val len = r.getAs[String]("length").toLong
      val all = Files.readAllBytes(file)
      assert(off + len <= all.length, "member slice out of file bounds")
      val slice = java.util.Arrays.copyOfRange(all, off.toInt, (off + len).toInt)
      val text = new String(new GZIPInputStream(
        new java.io.ByteArrayInputStream(slice)).readAllBytes(), "UTF-8")
      assert(text.startsWith("WARC/1.1\r\n"), "slice is not a record start")
      assert(text.contains(s"WARC-Target-URI: ${r.getAs[String]("original")}"),
        s"member at $off does not hold ${r.getAs[String]("original")}")
    }
    idx.unpersist()
  }
}
