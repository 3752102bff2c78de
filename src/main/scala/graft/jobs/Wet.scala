package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WET extraction — the `conversion`-record derivative (WARC 1.1 §6.8; the
 * shape Common Crawl ships as `.warc.wet.gz`, which is what most
 * training-data pipelines actually consume instead of raw WARCs): for every
 * `response` record, extract the text of its HTML payload and emit a
 * `conversion` record that links back to its source via `WARC-Refers-To`
 * (+ `WARC-Refers-To-Target-URI`/`-Date`, the WARC 1.1 §5.7 back-pointers).
 *
 * Everything is existing machinery composed: the DSv2 scan (pushdown keeps
 * non-response records out of the read), `http_payload` cuts the HTTP
 * headers off stored message blocks, [[graft.ops.TextOps.htmlToText]] does
 * the strip/decode chain, and the DSv2 sink serializes + recomputes the
 * block digest over the CONVERTED text (a conversion record's digest covers
 * its own content, never the source's). Record IDs are the deterministic
 * urn:uuid of (source record id, "wet") — re-running extraction yields
 * byte-identical output, the engine-wide determinism contract.
 *
 * Scale shape: scan → narrow per-row transforms → sink. No shuffle, no
 * driver state; the only wide operation is the sink's own file commit.
 */
object Wet {

  /** Sink-ready `conversion` rows for every response record under
    * `warcDir`. `write(...)` is the one-call wrapper. */
  def conversionRows(spark: SparkSession, warcDir: String): DataFrame = {
    val resp = spark.read.format("graft.sources.WarcDataSource").load(warcDir)
      .filter(col("warc_type") === "response")
    // stored content is either a full HTTP message block (cut at the
    // end-of-headers) or a bare payload (no status line) — handle both
    val raw = col("content")
    val payload = when(raw.isNull, lit(""))
      .otherwise(coalesce(graft.warc.HttpExprs.http_payload(raw), raw).cast("string"))
    val staged = resp.select(col("record_id"), col("target_uri"), col("warc_date"),
      payload.as("__wet_payload"))
    // text staged as an attribute: the 16-step HtmlChain must run once per
    // row, not once per consumer (Content-Length + content)
    val texted = staged.select(col("record_id"), col("target_uri"), col("warc_date"),
      graft.ops.TextOps.htmlToText(col("__wet_payload")).as("__wet_text"))
    texted.select(
      lit("WARC/1.1").as("version"),
      map_filter(map(
        lit("WARC-Record-ID"), graft.fetch.Fetch.urnUuid(col("record_id"), lit("wet")),
        lit("WARC-Type"), lit("conversion"),
        lit("WARC-Date"), col("warc_date"),
        lit("WARC-Target-URI"), col("target_uri"),
        lit("WARC-Refers-To"), col("record_id"),
        lit("WARC-Refers-To-Target-URI"), col("target_uri"),
        lit("WARC-Refers-To-Date"), col("warc_date"),
        lit("Content-Length"), octet_length(col("__wet_text")).cast("string"),
        lit("Content-Type"), lit("text/plain")),
        (_, v) => v.isNotNull).as("headers"),
      col("__wet_text").as("content"))
  }

  /** Extract and write the WET archive in one call (rotated, compressed,
    * all-or-nothing DSv2 commit like every sink write). */
  def write(spark: SparkSession, warcDir: String, wetDir: String,
            compression: String = "gzip"): Unit =
    conversionRows(spark, warcDir)
      .write.format("graft.sources.WarcDataSource").mode("append")
      .option("compression", compression).save(wetDir)
}
