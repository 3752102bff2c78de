package graft

import org.apache.spark.sql.functions._

import graft.functions.WarcDigest.warc_sha1_b32
import graft.warc.RecordSerializer

/** K2/K3/K4 serialization goldens: record layout per write.go:56-65,22-26;
  * canonical header order per SURVEY §7.6 (the reference's own order is Go
  * map iteration — nondeterministic — so the canonical order is ours). */
class WarcSerializeSpec extends SparkSpec {

  test("resource record serializes to the exact WARC byte layout") {
    import spark.implicits._
    val df = Seq(("<urn:uuid:0000-1>", "2023-11-14T22:13:20Z",
      "http://host1.example/p1", "text/plain", "hello world"))
      .toDF("rid", "date", "uri", "ct", "content")
    val rec = df.select(RecordSerializer.resourceRecord(
      col("rid"), col("date"), col("uri"), col("ct"), col("content")).as("rec"))
      .head().getString(0)
    val expected =
      "WARC/1.1\r\n" +
        "WARC-Date: 2023-11-14T22:13:20Z\r\n" +
        "WARC-Type: resource\r\n" +
        "WARC-Record-ID: <urn:uuid:0000-1>\r\n" +
        "Content-Length: 11\r\n" +
        "WARC-Target-URI: http://host1.example/p1\r\n" +
        "Content-Type: text/plain\r\n" +
        "\r\n" +
        "hello world" +
        "\r\n\r\n"
    assert(rec === expected)
  }

  test("null headers are omitted; extras sort lexicographically after canonical keys") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    val rec = df.select(RecordSerializer.serialize(lit("WARC/1.1"), Map(
      "WARC-Type" -> lit("metadata"),
      "WARC-Truncated" -> lit(null).cast("string"), // omitted
      "Z-Custom" -> lit("z"),
      "A-Custom" -> lit("a")), lit("c")).as("rec")).head().getString(0)
    assert(rec ===
      "WARC/1.1\r\nWARC-Type: metadata\r\nA-Custom: a\r\nZ-Custom: z\r\n\r\nc\r\n\r\n")
  }

  test("block digest of serialized content matches the golden sha1 (digest_test.go:11)") {
    import spark.implicits._
    val df = Seq("hello world").toDF("content")
    val d = df.select(warc_sha1_b32(col("content"))).head().getString(0)
    assert(d === "sha1:FKXGYNOJJ7H3IFO35FPUBC445EPOQRXN")
  }

  test("warcinfo payload is key: value CRLF lines (write.go:156-186)") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    val p = df.select(RecordSerializer.warcinfoPayload(Seq(
      "hostname" -> lit("h1"),
      "format" -> lit("WARC file version 1.1"))).as("p")).head().getString(0)
    assert(p === "hostname: h1\r\nformat: WARC file version 1.1\r\n")
  }

  test("rotated filename format (file.go:14-63) with %05d serial padding") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    val f = df.select(RecordSerializer.warcFilename(
      lit("GRAFT"), lit("20231114221320000"), lit(7), lit("node1")).as("f"))
      .head().getString(0)
    assert(f === "GRAFT-20231114221320000-00007-node1.warc.gz")
  }
}
