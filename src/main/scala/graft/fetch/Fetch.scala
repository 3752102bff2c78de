package graft.fetch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.WarcDigest
import graft.functions.WarcDigest.warc_sha1_b32
import graft.web.SyntheticWeb

/**
 * Fetch + three-tier dedup + WARC-shaped row construction, reproducing the
 * reference's record semantics Spark-natively:
 *
 *  - fetch          = equi-join of the scheduled frontier against the docs
 *                     table (the synthetic "web"); payload/digest columns are
 *                     codegen'd expressions (write.go:96-101 analog)
 *  - dedup tiers    = local (prior-round digest_seen table + intra-round
 *                     earliest-wins) -> doppelganger -> cdx, as a coalesce
 *                     over left joins with the reference's precedence
 *                     (dialer.go:707-735) and guards: payload >= threshold
 *                     (client.go:160-162), digest not in the empty-payload
 *                     set (dialer.go:84-89)
 *  - revisit rows   = content truncated to the HTTP header block (the
 *                     findEndOfHeadersOffset cut, dialer.go:800-861), profile
 *                     `identical-payload-digest`, WARC-Truncated: length,
 *                     refers-to fields; WARC-Refers-To (uuid) set by the
 *                     local tier only (dedupe.go:86,133)
 *  - pairing        = response row (seq 0) ordered before request row (seq 1),
 *                     cross-linked via concurrent_to (dialer.go:532-592)
 *
 * Determinism contract (SURVEY §7.6): record ids are xxhash64-derived
 * pseudo-uuids of (url_key, round, seq); capture time is the round epoch.
 */
object Fetch {

  case class Config(
      round: Int,
      roundEpoch: Long, // capture_time = this, never now()
      dedupSizeThreshold: Long = 2048,
      requestUserAgent: String = "graft/0.1",
      // oversize-response guard (client.go:190-194, MaxReadBeforeTruncate
      // default 1 GB): payloads are cut at this many bytes and the response
      // row carries WARC-Truncated: length
      maxReadBeforeTruncate: Int = 1 << 30,
      // true = discover outlinks by parsing the fetched HTML payload
      // (extract -> RFC 3986 resolve -> canonicalize); false = explode the
      // fixture's pre-tokenized link spans
      parseLinks: Boolean = false)

  val RevisitProfile = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"

  /** Deterministic pseudo-uuid "<urn:uuid:...>" from hash columns (SURVEY §7.6). */
  def urnUuid(parts: Column*): Column = {
    val h1 = lpad(lower(hex(xxhash64(lit("uuid-hi") +: parts: _*))), 16, "0")
    val h2 = lpad(lower(hex(xxhash64(lit("uuid-lo") +: parts: _*))), 16, "0")
    concat(lit("<urn:uuid:"),
      substring(h1, 1, 8), lit("-"), substring(h1, 9, 4), lit("-"),
      substring(h1, 13, 4), lit("-"), substring(h2, 1, 4), lit("-"),
      substring(h2, 5, 12), lit(">"))
  }

  /**
   * Join scheduled frontier rows against the page table ("the web") and
   * derive payload/content/digest columns. 404s (scheduled URLs with no
   * page) are kept with null doc columns and status 404.
   */
  def fetch(scheduled: DataFrame, pages: DataFrame, cfg: Config,
            dns: Option[DataFrame] = None): DataFrame = {
    val p = pages.select(
      col("url_key").as("page_url_key"), col("doc_id"), col("spans"))
    var joined = scheduled.join(p, scheduled("url_key") === p("page_url_key"), "left")
    // J5: the DNS cache as a broadcast dimension — the resolved address
    // stamps WARC-IP-Address on both records of the pair (dialer.go:579-583)
    joined = dns match {
      case Some(d) => joined.join(
        broadcast(d.select(col("host").as("__dns_host"), col("ipv4").as("ip"))),
        joined("host") === col("__dns_host"), "left").drop("__dns_host")
      case None => joined.withColumn("ip", lit(null).cast("string"))
    }
    // parseLinks implies an HTML web: the fetched body must carry the links
    // as markup for the real extractor to find
    val payload =
      if (cfg.parseLinks) SyntheticWeb.htmlPayloadExpr(col("spans"))
      else SyntheticWeb.payloadExpr(col("spans"))
    joined
      .withColumn("status", when(col("doc_id").isNull, lit(404)).otherwise(lit(200)))
      .withColumn("__payload_raw", when(col("doc_id").isNull, lit("")).otherwise(payload))
      // oversize guard (client.go:190-194): the cap is BYTE-denominated like
      // the reference's (octet_length + a char-boundary-safe byte cut, not
      // substring's character count); the digest is computed over the KEPT
      // bytes (the reference digests what it spooled) and the row is flagged
      // for WARC-Truncated: length
      .withColumn("payload_truncated",
        octet_length(col("__payload_raw")) > cfg.maxReadBeforeTruncate)
      .withColumn("payload", when(col("payload_truncated"),
        graft.functions.TextBytes.utf8_byte_truncate(col("__payload_raw"), cfg.maxReadBeforeTruncate))
        .otherwise(col("__payload_raw")))
      // HTTP headers reflect what the server DECLARED (the full length) even
      // when the body is cut — the reference records the wire headers as
      // received and truncates only the payload bytes
      .withColumn("http_headers", when(col("doc_id").isNull,
        lit("HTTP/1.1 404 Not Found\r\nContent-Length: 0\r\n\r\n"))
        .otherwise(SyntheticWeb.headersExpr(col("__payload_raw"))))
      .withColumn("content", concat(col("http_headers"), col("payload")))
      .withColumn("payload_digest", warc_sha1_b32(col("payload")))
      // sizes are OCTETS throughout (SizeThreshold and Content-Length are
      // byte counts in the reference; == chars only for ASCII payloads)
      .withColumn("payload_size", octet_length(col("payload")).cast("long"))
      .drop("page_url_key", "__payload_raw")
  }

  /**
   * Apply the dedup tiers and emit the full warc_rows table (SURVEY §7.1)
   * plus companion outputs. Input: `fetch` output; `digestSeen` is the
   * prior-round local revisit table (payload_digest, record_id, target_uri,
   * warc_date); `dopp`/`cdx` are the remote reference tables.
   */
  def buildWarcRows(fetched: DataFrame, digestSeen: DataFrame,
                    dopp: Option[DataFrame], cdx: Option[DataFrame],
                    cfg: Config): DataFrame = {
    val captureTime = timestamp_seconds(lit(cfg.roundEpoch))

    val eligible = col("payload_size") >= cfg.dedupSizeThreshold &&
      !col("payload_digest").isin(WarcDigest.EmptyDigests: _*) && col("status") === 200

    // intra-round earliest-wins order (deterministic stand-in for the
    // reference's sequential first-insert, dialer.go:616-633)
    val wDigest = Window.partitionBy(col("payload_digest"))
      .orderBy(col("priority").asc, col("discovery_time").asc, col("url_key").asc)

    val seen = digestSeen.select(
      col("payload_digest").as("seen_digest"), col("record_id").as("seen_uuid"),
      col("target_uri").as("seen_uri"), col("warc_date").as("seen_date"))
    val dgT = dopp.map(_.select(col("digest").as("dg_digest"), col("id").as("dg_id"),
      col("uri").as("dg_uri"), col("date_compact").as("dg_date")))
    val cdxT = cdx.map(_.select(col("digest").as("cdx_digest"), col("uri").as("cdx_uri"),
      col("ts_compact").as("cdx_ts")))

    // SKEW GUARD (VERDICT r1 "what's wrong" #2): the digest window and the
    // dedup-tier joins run over the ELIGIBLE slice only. Ineligible rows are
    // hot-key magnets — every 404 carries the digest of "" and every tiny
    // page shares few distinct digests — and a `when(eligible, rank)` only
    // nulls the rank, it still SHUFFLES every such row into one digest
    // partition. Eligibility is uniform within a digest group (same payload
    // => same size; 404s all hash to an empty digest that is itself
    // ineligible), so windowing the slice yields identical ranks/firsts.
    val fe = fetched.filter(eligible)
      .withColumn("dup_rank", row_number().over(wDigest))
      .withColumn("first_url_key", first(col("url_key")).over(wDigest))
      .withColumn("first_uri", first(col("url")).over(wDigest))
    var dfe = fe.join(seen, col("payload_digest") === col("seen_digest"), "left")
    dfe = dgT.map(t => dfe.join(t, col("payload_digest") === col("dg_digest"), "left")).getOrElse(
      dfe.withColumn("dg_digest", lit(null)).withColumn("dg_id", lit(null))
        .withColumn("dg_uri", lit(null)).withColumn("dg_date", lit(null)))
    dfe = cdxT.map(t => dfe.join(t, col("payload_digest") === col("cdx_digest"), "left")).getOrElse(
      dfe.withColumn("cdx_digest", lit(null)).withColumn("cdx_uri", lit(null))
        .withColumn("cdx_ts", lit(null)))

    // ineligible slice: never windowed, never joined — rank 1, all tier
    // columns null, schema-aligned to the joined side by name+type
    val fi0 = fetched.filter(!eligible)
      .withColumn("dup_rank", lit(1))
      .withColumn("first_url_key", col("url_key"))
      .withColumn("first_uri", col("url"))
    val fiCols = fi0.columns.toSet
    val fi = dfe.schema.fields.foldLeft(fi0) { (d, f) =>
      if (fiCols.contains(f.name)) d else d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val df = dfe.unionByName(fi)

    // tier precedence: local (prior rounds) -> doppelganger -> cdx ->
    // intra-round local (an earlier insert this round). A remote hit applies
    // to ALL rows of the digest (including rank 1: its original never
    // inserts, dialer.go:616-633 runs only for non-deduped responses).
    val dedupeSource =
      when(col("seen_digest").isNotNull, lit("local"))
        .when(col("dg_digest").isNotNull, lit("doppelganger"))
        .when(col("cdx_digest").isNotNull, lit("cdx"))
        .when(col("dup_rank") > 1, lit("local"))
        .otherwise(lit("none"))

    val intraRefUuid = urnUuid(col("first_url_key"), lit(cfg.round), lit(0))
    val refersToUuid = // local tier only sets WARC-Refers-To (dedupe.go:86,133)
      when(col("seen_digest").isNotNull, col("seen_uuid"))
        .when(dedupeSource === "local" && col("dup_rank") > 1, intraRefUuid)
        .otherwise(lit(null).cast("string"))
    val refersToUri =
      when(col("seen_digest").isNotNull, col("seen_uri"))
        .when(col("dg_digest").isNotNull, col("dg_uri"))
        .when(col("cdx_digest").isNotNull, col("cdx_uri"))
        .when(dedupeSource === "local" && col("dup_rank") > 1, col("first_uri"))
        .otherwise(lit(null).cast("string"))
    val refersToDate =
      when(col("seen_digest").isNotNull, col("seen_date"))
        .when(col("dg_digest").isNotNull, to_timestamp(col("dg_date").cast("string"), "yyyyMMddHHmmss"))
        .when(col("cdx_digest").isNotNull, to_timestamp(col("cdx_ts"), "yyyyMMddHHmmss"))
        .when(dedupeSource === "local" && col("dup_rank") > 1, captureTime)
        .otherwise(lit(null).cast("timestamp"))

    val annotated = df
      .withColumn("dedupe_source", dedupeSource)
      .withColumn("is_revisit", dedupeSource =!= "none")
      .withColumn("refers_to", refersToUuid)
      .withColumn("refers_to_target_uri", refersToUri)
      .withColumn("refers_to_date", refersToDate)

    // ---- row construction: response/revisit row + request row per fetch ----
    val respId = urnUuid(col("url_key"), lit(cfg.round), lit(0))
    val reqId = urnUuid(col("url_key"), lit(cfg.round), lit(1))
    val pairId = urnUuid(col("url_key"), lit(cfg.round), lit(9))

    // revisit = content truncated right after the header block (X2 cut)
    val respContent = when(col("is_revisit"), col("http_headers")).otherwise(col("content"))
    val respRows = annotated.select(
      respId.as("record_id"),
      pairId.as("pair_id"),
      when(col("is_revisit"), lit("revisit")).otherwise(lit("response")).as("warc_type"),
      col("url_key").as("target_uri"),
      captureTime.as("warc_date"),
      octet_length(respContent).cast("long").as("content_length"),
      warc_sha1_b32(respContent).as("block_digest"),
      col("payload_digest"),
      reqId.as("concurrent_to"),
      col("refers_to"), col("refers_to_target_uri"), col("refers_to_date"),
      when(col("is_revisit"), lit(RevisitProfile)).otherwise(lit(null).cast("string")).as("profile"),
      when(col("is_revisit") || col("payload_truncated"), lit("length"))
        .otherwise(lit(null).cast("string")).as("truncated"),
      when(col("is_revisit"), array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"))
        .otherwise(col("spans")).as("spans"),
      lit(0).as("seq"), // response precedes request (dialer.go:558-560)
      col("host"), col("ip"), col("dedupe_source"), col("status"),
      col("payload_size"), col("depth"), col("dup_rank"))

    val reqContent = concat(
      lit("GET "), regexp_replace(col("url_key"), lit("^[a-z]+://[^/]+"), lit("")),
      lit(" HTTP/1.1\r\nHost: "), col("host"),
      lit(s"\r\nUser-Agent: ${cfg.requestUserAgent}\r\nAccept-Encoding: identity\r\n\r\n"))
    val reqRows = annotated.select(
      reqId.as("record_id"),
      pairId.as("pair_id"),
      lit("request").as("warc_type"),
      col("url_key").as("target_uri"),
      captureTime.as("warc_date"),
      octet_length(reqContent).cast("long").as("content_length"),
      warc_sha1_b32(reqContent).as("block_digest"),
      lit(null).cast("string").as("payload_digest"),
      respId.as("concurrent_to"),
      lit(null).cast("string").as("refers_to"),
      lit(null).cast("string").as("refers_to_target_uri"),
      lit(null).cast("timestamp").as("refers_to_date"),
      lit(null).cast("string").as("profile"),
      lit(null).cast("string").as("truncated"),
      array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>").as("spans"),
      lit(1).as("seq"),
      col("host"), col("ip"), lit("none").as("dedupe_source"), col("status"),
      lit(0L).as("payload_size"), col("depth"), lit(1).as("dup_rank"))

    respRows.unionByName(reqRows)
  }

  /** New digest_seen entries this round: eligible, non-deduped originals (J2). */
  def newDigestEntries(warcRows: DataFrame, cfg: Config): DataFrame =
    warcRows
      .filter(col("warc_type") === "response" && col("dedupe_source") === "none" &&
        col("payload_size") >= cfg.dedupSizeThreshold &&
        !col("payload_digest").isin(WarcDigest.EmptyDigests: _*))
      // one entry per digest, earliest-wins (already rank-1 rows, but digests
      // can repeat across 404/ineligible boundaries — keep the deterministic min)
      .groupBy(col("payload_digest"))
      .agg(min(struct(col("target_uri"), col("record_id"), col("warc_date"), col("payload_size"))).as("e"))
      .select(
        col("payload_digest"),
        col("e.record_id").as("record_id"),
        col("e.target_uri").as("target_uri"),
        col("e.warc_date").as("warc_date"),
        col("e.payload_size").as("size"))

  /** Outlink extraction: the engine's generator (SURVEY §2.9) — explode link spans. */
  def outlinks(fetched: DataFrame, cfg: Config): DataFrame =
    if (cfg.parseLinks) outlinksFromHtml(fetched, cfg)
    else fetched
      .filter(col("status") === 200)
      .select(col("url_key").as("via"), col("priority"), col("depth"),
        explode(filter(col("spans"), s => s.getField("kind") === "link")).as("l"))
      .select(
        col("l.text").as("url"),
        least(col("priority") + 1, lit(9)).cast("int").as("priority"),
        timestamp_seconds(lit(cfg.roundEpoch)).as("discovery_time"),
        (col("depth") + 1).cast("int").as("depth"),
        col("via"))

  /** Real link discovery: parse the fetched HTML payload — extract href/src
    * attribute values in document order, drop non-fetchable schemes
    * (javascript:/mailto:/data:/…), resolve each against the page URI per
    * RFC 3986 §5.2 honouring a `<base href>` when present (itself resolved
    * against the page URI first, per HTML's base-element contract), then
    * canonicalize into frontier url_keys. Everything is codegen expressions
    * over the fetched frame — narrow (explode only), no shuffle; per-page
    * `array_distinct` dedups BEFORE the explode so a nav-heavy page doesn't
    * fan out duplicate frontier rows (the cross-page dedup belongs to the
    * seen-set anti-join downstream). */
  def outlinksFromHtml(fetched: DataFrame, cfg: Config): DataFrame = {
    import graft.functions.UrlResolve.url_resolve
    import graft.functions.UrlCanonicalize.url_canonicalize
    fetched
      .filter(col("status") === 200)
      .select(col("url_key").as("via"), col("priority"), col("depth"),
        col("url_key").as("__page"), col("payload"))
      // stage the regex hits as attributes: each pattern runs ONCE per page
      .withColumn("__bh", regexp_extract(col("payload"),
        "(?i)<base\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"']", 1))
      .withColumn("__base",
        when(col("__bh") === "", col("__page"))
          .otherwise(url_resolve(col("__page"), col("__bh"))))
      // the <base> element's own href is resolution CONTEXT, not an outlink —
      // strip base tags before extracting
      .withColumn("__refs", array_distinct(filter(
        graft.ops.TextOps.extractLinks(
          regexp_replace(col("payload"), "(?i)<base\\b[^>]*>", " ")),
        r => r =!= "" && !r.rlike(graft.ops.TextOps.NonFetchableLinkPattern))))
      .select(col("via"), col("priority"), col("depth"), col("__base"),
        explode(col("__refs")).as("__ref"))
      .select(col("via"), col("priority"), col("depth"),
        url_canonicalize(url_resolve(col("__base"), col("__ref"))).as("url"))
      .select(
        col("url"),
        least(col("priority") + 1, lit(9)).cast("int").as("priority"),
        timestamp_seconds(lit(cfg.roundEpoch)).as("discovery_time"),
        (col("depth") + 1).cast("int").as("depth"),
        col("via"))
  }
}
