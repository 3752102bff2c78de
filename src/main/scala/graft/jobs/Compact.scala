package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.warc.{HttpExprs, RecordSerializer}

/**
 * Retroactive archive deduplication ("compact") and its inverse
 * ("resolve") — the capability the reference only has at CAPTURE time
 * (dialer.go:706-738 writes revisits as it fetches): given an EXISTING
 * archive, keep the first response per payload digest and rewrite every
 * later duplicate as a `revisit` record referencing the original
 * (identical-payload-digest profile, headers-only block, WARC 1.1 §6.7.2
 * semantics — the same record shape the crawl's own dedup tier emits,
 * Fetch.buildWarcRows). `resolve` reconstructs full responses from a
 * compacted archive (revisit head + original payload) — what a replay
 * front-end serves.
 *
 * Scale shape (compact): one map-side-combinable `min(struct)` per digest
 * picks winners, one shuffle joins candidates to their winner, everything
 * else is narrow codegen (the byte-exact `http_head` cut) into the DSv2
 * sink. Never a window over the digest groups — a boilerplate payload
 * repeated 10⁹ times partial-aggregates to one row per task. Resolve is one
 * join from revisits to their originals on record id.
 *
 * Earliest-wins total order: (WARC-Date, record id) — ISO dates compare
 * chronologically as strings, the id breaks date ties deterministically.
 * Old `warcinfo` records are dropped (the sink stamps each output file with
 * its own); every other record type passes through unchanged.
 */
object Compact {

  /** lowercase (scan map) -> canonical header name for serialization. */
  private val canonKeys: Column = {
    val pairs = RecordSerializer.CanonicalOrder.flatMap(k => Seq(lit(k.toLowerCase), lit(k)))
    map(pairs: _*)
  }

  private def canonHeaders(headers: Column): Column =
    transform_keys(headers, (k, _) => coalesce(element_at(canonKeys, k), k))

  /** The compaction DECISION layer, exposed for the cross-engine oracle
    * (q79): appends `is_winner` + `winner_id`/`winner_uri`/`winner_date` to
    * the candidate frame — earliest (date, id) per digest wins, via the
    * map-side-combinable `min(struct)` (never a window over digest groups). */
  def plan(cands: DataFrame, digestCol: String = "payload_digest",
           dateCol: String = "warc_date", idCol: String = "record_id",
           uriCol: String = "target_uri"): DataFrame = {
    val winners = cands.groupBy(col(digestCol).as("__dig"))
      .agg(min(struct(col(dateCol).as("d"), col(idCol).as("id"),
        col(uriCol).as("u"))).as("__w"))
    // null-SAFE join: a null digest is a group like any other — the plain
    // equi-join would silently drop those candidates from the decision
    // (neither winner nor revisit = records deleted from a compaction)
    cands.join(winners, col(digestCol) <=> col("__dig")).drop("__dig")
      .withColumn("is_winner", col(dateCol) === col("__w.d") && col(idCol) === col("__w.id"))
      .withColumn("winner_id", col("__w.id"))
      .withColumn("winner_uri", col("__w.u"))
      .withColumn("winner_date", col("__w.d"))
      .drop("__w")
  }

  /** Sink-ready rows for the compacted copy of the archive under `warcDir`.
    * `sizeThreshold`: blocks smaller than this never dedup (the crawl's F5
    * gate — revisit bookkeeping costs more than tiny payloads save). */
  def compactRows(spark: SparkSession, warcDir: String,
                  sizeThreshold: Long = 64): DataFrame = {
    val recs = spark.read.format("graft.sources.WarcDataSource").load(warcDir)
      .filter(col("warc_type") =!= "warcinfo")
    // null-safe size gate (round-7 ADVICE): a NULL-content response made
    // the predicate NULL, so the record fell out of BOTH filter(isCand)
    // and filter(!isCand) — silently deleted from the compacted archive
    val isCand = col("warc_type") === "response" &&
      coalesce(octet_length(col("content")), lit(0L)) >= sizeThreshold
    // a stored digest is trusted; a digest-less archive (foreign tools,
    // keepDigests=false rewrites) still compacts — the digest is recomputed
    // over the payload cut (whole block when not an HTTP message), the same
    // recompute VerifyWarc trusts
    val computedDigest = coalesce(nullif(col("payload_digest"), lit("")),
      graft.functions.WarcDigest.warc_sha1_b32(
        coalesce(HttpExprs.http_payload(col("content")), col("content"))))
    val joined = plan(recs.filter(isCand).withColumn("__cdig", computedDigest),
      digestCol = "__cdig")
    val losers = joined.filter(!col("is_winner"))

    // the revisit rewrite: headers-only block (empty when the stored block
    // was a bare payload with no HTTP headers), original payload digest
    // carried, block digest left for the writer to recompute over the cut;
    // NO record-level Content-Type — the crawl's revisit convention, which
    // also tells VerifyWarc's payload check this block holds no payload
    val revisits = losers.select(
      col("version"),
      map_filter(map(
        lit("WARC-Record-ID"), col("record_id"),
        lit("WARC-Type"), lit("revisit"),
        lit("WARC-Date"), col("warc_date"),
        lit("WARC-Target-URI"), col("target_uri"),
        lit("WARC-Payload-Digest"), col("__cdig"),
        lit("WARC-Profile"), lit(graft.fetch.Fetch.RevisitProfile),
        lit("WARC-Refers-To"), col("winner_id"),
        lit("WARC-Refers-To-Target-URI"), col("winner_uri"),
        lit("WARC-Refers-To-Date"), col("winner_date"),
        lit("WARC-Truncated"), lit("length"),
        lit("WARC-Concurrent-To"), col("concurrent_to"),
        lit("WARC-IP-Address"), element_at(col("headers"), "warc-ip-address")),
        (_, v) => v.isNotNull).as("headers"),
      coalesce(HttpExprs.http_head(col("content")), lit(Array.emptyByteArray))
        .as("content"))

    val keepers = recs.filter(!isCand)
      .unionByName(joined.filter(col("is_winner"))
        .drop("is_winner", "winner_id", "winner_uri", "winner_date", "__cdig"))
      .select(col("version"), canonHeaders(col("headers")).as("headers"), col("content"))
    keepers.unionByName(revisits)
  }

  /** Compact and write in one call (rotated, compressed, all-or-nothing
    * DSv2 commit). */
  def write(spark: SparkSession, warcDir: String, outDir: String,
            sizeThreshold: Long = 64, compression: String = "gzip"): Unit =
    compactRows(spark, warcDir, sizeThreshold)
      .write.format("graft.sources.WarcDataSource").mode("append")
      .option("compression", compression).save(outDir)

  /** The inverse, for replay: every revisit that references an original in
    * the same archive is reconstructed as a full response — the revisit's
    * own headers-only block (its fetch's HTTP headers) followed by the
    * ORIGINAL record's payload bytes; its payload digest then verifies
    * against its own content again. Records that aren't resolvable
    * revisits pass through unchanged. */
  def resolveRows(spark: SparkSession, warcDir: String): DataFrame = {
    val recs = spark.read.format("graft.sources.WarcDataSource").load(warcDir)
      .filter(col("warc_type") =!= "warcinfo")
    val originals = recs.filter(col("warc_type") === "response").select(
      col("record_id").as("__orig_id"),
      HttpExprs.http_payload(col("content")).as("__orig_payload"),
      col("content").as("__orig_content"))
    val isRevisit = col("warc_type") === "revisit" && col("refers_to").isNotNull
    // a revisit whose original is NOT in this archive (remote-tier dedup,
    // partial archive) passes through unresolved rather than degrading
    val resolvedHeaders = map_filter(map(
      lit("WARC-Record-ID"), col("record_id"),
      lit("WARC-Type"), lit("response"),
      lit("WARC-Date"), col("warc_date"),
      lit("WARC-Target-URI"), col("target_uri"),
      lit("WARC-Payload-Digest"), col("payload_digest"),
      lit("WARC-Concurrent-To"), col("concurrent_to"),
      lit("WARC-IP-Address"), element_at(col("headers"), "warc-ip-address"),
      // only an actual HTTP block may claim application/http — a bare-
      // payload reconstruction would otherwise trip the payload-digest
      // verification it just restored
      lit("Content-Type"), when(HttpExprs.http_head(col("content")).isNotNull,
        lit("application/http; msgtype=response"))),
      (_, v) => v.isNotNull)
    // head(revisit) ++ payload(original); bare-payload originals (no HTTP
    // headers in the stored block) contribute their whole block
    val resolvedContent = concat(
      coalesce(HttpExprs.http_head(col("content")), col("content"),
        lit(Array.emptyByteArray)),
      coalesce(col("__orig_payload"), col("__orig_content"),
        lit(Array.emptyByteArray)))
    val resolved = recs.filter(isRevisit)
      .join(originals, col("refers_to") === col("__orig_id"), "left")
      .select(
        col("version"),
        when(col("__orig_id").isNotNull, resolvedHeaders)
          .otherwise(canonHeaders(col("headers"))).as("headers"),
        when(col("__orig_id").isNotNull, resolvedContent)
          .otherwise(col("content")).as("content"))
    recs.filter(!isRevisit)
      .select(col("version"), canonHeaders(col("headers")).as("headers"), col("content"))
      .unionByName(resolved)
  }
}
