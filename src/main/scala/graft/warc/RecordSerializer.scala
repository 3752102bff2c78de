package graft.warc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Byte-exact WARC record serialization (K2, SURVEY §2.1), reproducing the
 * reference's record layout — version line + `Key: Value` CRLF header lines +
 * blank line + content block + `\r\n\r\n` trailer (write.go:56-65,22-26 in
 * /root/reference) — as a pure column expression, so serialization runs
 * inside whole-stage codegen and a sink write is just `select(serialize(...))`.
 *
 * Header order: the reference serializes Go map iteration order — which is
 * nondeterministic in the reference itself (write.go:133-137). Our engine's
 * determinism contract (SURVEY §7.6) fixes a canonical order instead: the
 * mandatory keys in the order WriteRecord injects them (write.go:70-101),
 * then any extras lexicographically. Missing (null) headers are skipped,
 * matching "inject defaults only when absent".
 */
object RecordSerializer {

  /** Canonical header order: mandatory keys per write.go:70-101, then extras. */
  val CanonicalOrder: Seq[String] = Seq(
    "WARC-Date", "WARC-Type", "WARC-Record-ID", "Content-Length",
    "WARC-Block-Digest", "WARC-Payload-Digest", "WARC-Target-URI",
    "WARC-Concurrent-To", "WARC-Refers-To", "WARC-Refers-To-Target-URI",
    "WARC-Refers-To-Date", "WARC-Profile", "WARC-Truncated",
    "WARC-Warcinfo-ID", "WARC-IP-Address", "Content-Type")

  private def orderKeys(keys: Seq[String]): Seq[String] = {
    val canon = CanonicalOrder.filter(keys.contains)
    canon ++ keys.filterNot(canon.contains).sorted
  }

  /**
   * Full record bytes as a string column. `headers` maps header key to a
   * (possibly null) string column; null values are omitted from the block.
   */
  def serialize(version: Column, headers: Map[String, Column], content: Column): Column = {
    val lines = orderKeys(headers.keys.toSeq).map { k =>
      val v = headers(k)
      when(v.isNull, lit("")).otherwise(concat(lit(k + ": "), v, lit("\r\n")))
    }
    concat(
      (concat(version, lit("\r\n")) +: lines) :+
        lit("\r\n") :+ coalesce(content, lit("")) :+ lit("\r\n\r\n"): _*)
  }

  /** Convenience: a `resource` record (the WriteRecord default type, write.go:75).
    * Content-Length is the OCTET count of the content block (WARC 1.1 §5.3;
    * the reference measures spooled bytes, write.go:84-90) — `octet_length`,
    * not `length`: character-counting would declare a length that disagrees
    * with the UTF-8 byte length for any non-ASCII content, producing a record
    * neither WarcIO nor the reference could read back. */
  def resourceRecord(recordId: Column, date: Column, targetUri: Column,
                     contentType: Column, content: Column,
                     version: String = "WARC/1.1"): Column =
    serialize(lit(version), Map(
      "WARC-Date" -> date,
      "WARC-Type" -> lit("resource"),
      "WARC-Record-ID" -> recordId,
      "Content-Length" -> octet_length(coalesce(content, lit(""))).cast("string"),
      "WARC-Target-URI" -> targetUri,
      "Content-Type" -> contentType), content)

  /** `conversion` record (WARC 1.1 §6.8 — the WET derivative's type):
    * extracted/converted content linked back to its source record via
    * `WARC-Refers-To` (§5.7). Content-Length covers the CONVERTED content;
    * digests, when wanted, are added by the sink over the same bytes. */
  def conversionRecord(recordId: Column, date: Column, targetUri: Column,
                       refersTo: Column, content: Column,
                       contentType: Column = lit("text/plain"),
                       version: String = "WARC/1.1"): Column =
    serialize(lit(version), Map(
      "WARC-Date" -> date,
      "WARC-Type" -> lit("conversion"),
      "WARC-Record-ID" -> recordId,
      "Content-Length" -> octet_length(coalesce(content, lit(""))).cast("string"),
      "WARC-Target-URI" -> targetUri,
      "WARC-Refers-To" -> refersTo,
      "Content-Type" -> contentType), content)

  /** `metadata` record (WARC 1.1 §6.6 — the WAT derivative's type): content
    * ABOUT another record (here: the JSON envelope), linked via
    * `WARC-Refers-To` like a conversion record. */
  def metadataRecord(recordId: Column, date: Column, targetUri: Column,
                     refersTo: Column, content: Column,
                     contentType: Column = lit("application/json"),
                     version: String = "WARC/1.1"): Column =
    serialize(lit(version), Map(
      "WARC-Date" -> date,
      "WARC-Type" -> lit("metadata"),
      "WARC-Record-ID" -> recordId,
      "Content-Length" -> octet_length(coalesce(content, lit(""))).cast("string"),
      "WARC-Target-URI" -> targetUri,
      "WARC-Refers-To" -> refersTo,
      "Content-Type" -> contentType), content)

  /**
   * warcinfo record (K3, write.go:156-186): payload is `key: value\r\n` lines
   * of the info map, defaults per utils.go:196-199.
   */
  def warcinfoPayload(fields: Seq[(String, Column)]): Column =
    concat(fields.map { case (k, v) => concat(lit(k + ": "), v, lit("\r\n")) }: _*)

  /** Rotated-file name (K4, file.go:14-63): Prefix-Timestamp-Serial-Host.warc.gz. */
  def warcFilename(prefix: Column, tsCompact: Column, serial: Column, host: Column,
                   ext: String = "warc.gz"): Column =
    concat(concat_ws("-", prefix, tsCompact, format_string("%05d", serial), host),
      lit("." + ext))
}
