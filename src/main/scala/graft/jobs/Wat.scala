package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/**
 * WAT extraction — the `metadata`-record derivative (WARC 1.1 §6.6; the
 * shape Common Crawl ships as `.warc.wat.gz`): for every `response` record,
 * emit a metadata record whose content is a JSON envelope describing the
 * source — its WARC headers, the HTTP response line + Content-Type, and the
 * HTML head/link structure (title, raw href/src values in document order).
 *
 * The envelope is built by deterministic string concatenation (fixed key
 * order, no insignificant whitespace, [[TextOps.jsonEscape]] on every free
 * string) rather than `to_json`: byte-stable output is the engine-wide
 * determinism contract, and the serialization is oracle-checked (q73) with
 * the identical construction replayed in SQL. WatSpec parses every envelope
 * BACK through `from_json` — the escape chain is guarded by a real parser,
 * not by eyeballing.
 *
 * Scale shape: scan → narrow per-row transforms → sink. No shuffle; same
 * plan family as [[Wet]].
 */
object Wat {

  /** The JSON envelope as a column expression over staged attributes.
    * Single-sourced: `conversionRows` builds it over parsed responses, q73
    * over templated fields, and the oracle replays the same concatenation. */
  def envelope(recordId: Column, date: Column, targetUri: Column,
               contentLength: Column, status: Column, contentType: Column,
               title: Column, links: Column): Column = {
    def esc(c: Column) = TextOps.jsonEscape(c)
    val linksJson = concat(lit("["),
      array_join(transform(links, r => concat(lit("{\"url\":\""), esc(r), lit("\"}"))), ","),
      lit("]"))
    concat(
      lit("{\"Envelope\":{\"Format\":\"WARC\",\"WARC-Header-Metadata\":{" +
        "\"WARC-Record-ID\":\""), esc(recordId),
      lit("\",\"WARC-Date\":\""), esc(date),
      lit("\",\"WARC-Type\":\"response\",\"WARC-Target-URI\":\""), esc(targetUri),
      lit("\",\"Content-Length\":"), contentLength.cast("string"),
      lit("},\"Payload-Metadata\":{\"HTTP-Response-Metadata\":{" +
        "\"Response-Message\":{\"Status\":"), status.cast("string"),
      lit("},\"Headers\":{\"Content-Type\":\""), esc(contentType),
      lit("\"},\"HTML-Metadata\":{\"Head\":{\"Title\":\""), esc(title),
      lit("\"},\"Links\":"), linksJson,
      lit("}}}}}"))
  }

  /** Sink-ready `metadata` rows for every response record under `warcDir`. */
  def metadataRows(spark: SparkSession, warcDir: String): DataFrame = {
    val resp = spark.read.format("graft.sources.WarcDataSource").load(warcDir)
      .filter(col("warc_type") === "response")
    val raw = col("content")
    val rawStr = raw.cast("string")
    val payload = when(raw.isNull, lit(""))
      .otherwise(coalesce(graft.warc.HttpExprs.http_payload(raw), raw).cast("string"))
    // every extractor staged as an attribute: one pass per pattern per row
    val staged = resp.select(col("record_id"), col("target_uri"), col("warc_date"),
      octet_length(raw).cast("long").as("__len"),
      coalesce(graft.warc.HttpExprs.parseStatus(rawStr), lit(200)).as("__status"),
      coalesce(nullif(graft.warc.HttpExprs.parseHttpHeader(rawStr, "Content-Type"), lit("")),
        lit("text/html")).as("__ctype"),
      payload.as("__payload"))
      .select(col("record_id"), col("target_uri"), col("warc_date"),
        col("__len"), col("__status"), col("__ctype"),
        TextOps.htmlTitle(col("__payload")).as("__title"),
        TextOps.extractLinks(col("__payload")).as("__links"))
    val env = envelope(col("record_id"), col("warc_date"), col("target_uri"),
      col("__len"), col("__status"), col("__ctype"), col("__title"), col("__links"))
    staged.select(
      lit("WARC/1.1").as("version"),
      map(
        lit("WARC-Record-ID"), graft.fetch.Fetch.urnUuid(col("record_id"), lit("wat")),
        lit("WARC-Type"), lit("metadata"),
        lit("WARC-Date"), col("warc_date"),
        lit("WARC-Target-URI"), col("target_uri"),
        lit("WARC-Refers-To"), col("record_id"),
        lit("Content-Type"), lit("application/json")).as("headers"),
      env.as("content"))
  }

  /** Extract and write the WAT archive in one call. */
  def write(spark: SparkSession, warcDir: String, watDir: String,
            compression: String = "gzip"): Unit =
    metadataRows(spark, warcDir)
      .write.format("graft.sources.WarcDataSource").mode("append")
      .option("compression", compression).save(watDir)
}
