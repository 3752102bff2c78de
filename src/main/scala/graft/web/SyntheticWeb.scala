package graft.web

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UrlCanonicalize.url_canonicalize
import graft.functions.WarcDigest.warc_sha1_b32

/**
 * Deterministic synthetic "web" per FIXTURES.md §1-3: an interleaved docs
 * table (doc_id, spans[kind,text,media_ref,offset]), a page/url space with a
 * skewed host distribution (one hot host to exercise salting/AQE), a seed
 * list with duplicate + canonicalization-variant URLs, and the dedup-tier
 * fixture tables (cdx, doppelganger, robots, dns).
 *
 * Everything derives from `spark.range` + `xxhash64` — no RNG, no wall
 * clock — so any two runs (and any two parallelism levels) generate
 * bit-identical tables. Content is keyed by a *content class* smaller than
 * the doc space, so a controlled fraction of pages are payload-duplicates:
 * that drives the revisit/dedup tier exactly like the reference's duplicate
 * fetches (/root/reference/client_test.go:844-914).
 */
object SyntheticWeb {

  /** Number of distinct content classes for n docs (~12% of pages are payload dups). */
  private def classesFor(n: Long): Long = math.max(1L, (n * 88) / 100)

  /** Deterministic host id for page j: host 0 is "hot" (hotPermille/1000 of pages). */
  private def hostExpr(j: Column, numHosts: Int, hotPermille: Int): Column =
    when(pmod(xxhash64(lit("hostsel"), j), lit(1000)) < lit(hotPermille), lit(0))
      .otherwise(lit(1) + pmod(xxhash64(lit("hostpick"), j), lit(math.max(1, numHosts - 1))))

  private def urlExpr(j: Column, numHosts: Int, hotPermille: Int): Column =
    concat(lit("http://host"), hostExpr(j, numHosts, hotPermille).cast("string"),
      lit(".example/p"), j.cast("string"))

  /**
   * Pages: one row per URL in the synthetic web.
   * Columns: page_id (index), doc_id, url, url_key (already canonical by
   * construction), host, cls (content class), spans.
   */
  def pages(spark: SparkSession, n: Long,
            numHosts: Int = 50, hotPermille: Int = 100): DataFrame = {
    val j = col("id")
    val cls = pmod(xxhash64(lit("content"), j), lit(classesFor(n)))

    // span construction, all keyed by content class so payload dups share spans
    val nSpans = lit(1) + pmod(xxhash64(lit("nspans"), cls), lit(8))
    val c = cls // captured for lambdas
    val spans = transform(sequence(lit(0), nSpans - lit(1)), k => {
      val sel = pmod(xxhash64(lit("kind"), c, k), lit(5))
      val kind = when(sel <= 1, lit("text")).when(sel === 2, lit("media")).otherwise(lit("link"))
      val words = concat_ws(" ",
        transform(sequence(lit(0), lit(4) + pmod(xxhash64(lit("nw"), c, k), lit(12))),
          w => concat(lit("w"), pmod(xxhash64(lit("word"), c, k, w), lit(500)).cast("string"))))
      val target = pmod(xxhash64(lit("link"), c, k), lit(n))
      val linkUrl = urlExpr(target, numHosts, hotPermille)
      val text = when(kind === "text", words).when(kind === "link", linkUrl).otherwise(lit(""))
      val mediaRef = when(kind === "media",
        concat(lit("media://"), lower(hex(xxhash64(lit("media"), c, k))))).otherwise(lit(""))
      struct(kind.as("kind"), text.as("text"), mediaRef.as("media_ref"), k.cast("int").as("offset"))
    })

    spark.range(n).select(
      j.as("page_id"),
      format_string("d%08d", j).as("doc_id"),
      urlExpr(j, numHosts, hotPermille).as("url"),
      urlExpr(j, numHosts, hotPermille).as("url_key"),
      concat(lit("host"), hostExpr(j, numHosts, hotPermille).cast("string"), lit(".example")).as("host"),
      cls.as("cls"),
      spans.as("spans"))
  }

  /** The exact `input_hint` shape: (doc_id, spans). */
  def docs(spark: SparkSession, n: Long,
           numHosts: Int = 50, hotPermille: Int = 100): DataFrame =
    pages(spark, n, numHosts, hotPermille).select("doc_id", "spans")

  /**
   * Seed list (FIXTURES.md §2): numSeeds rows over the page space;
   * ~5% exact duplicates of the previous seed, ~5% denormalized variants
   * (uppercase host / explicit :80 / dot-segments / %-encoded unreserved)
   * that canonicalize to an existing seed's url_key.
   */
  def seeds(spark: SparkSession, numSeeds: Long, n: Long,
            numHosts: Int = 50, hotPermille: Int = 100): DataFrame = {
    val i = col("id")
    val pick = pmod(xxhash64(lit("seed"), i), lit(n))
    val prevPick = pmod(xxhash64(lit("seed"), greatest(i - 1, lit(0))), lit(n))
    val variant = pmod(xxhash64(lit("variant"), i), lit(20)) // 0=dup, 1=denorm, else plain
    val base = urlExpr(pick, numHosts, hotPermille)
    val dupOfPrev = urlExpr(prevPick, numHosts, hotPermille)
    // denormalized forms of the *previous* seed's URL (canonicalize back to it)
    val denormSel = pmod(xxhash64(lit("denorm"), i), lit(4))
    val host = concat(lit("host"), hostExpr(prevPick, numHosts, hotPermille).cast("string"), lit(".example"))
    val pathN = prevPick.cast("string")
    val denorm =
      when(denormSel === 0, concat(lit("HTTP://"), upper(host), lit("/p"), pathN))
        .when(denormSel === 1, concat(lit("http://"), host, lit(":80/p"), pathN))
        .when(denormSel === 2, concat(lit("http://"), host, lit("/a/../p"), pathN))
        .otherwise(concat(lit("http://"), host, lit("/%70"), pathN)) // %70 = 'p' (unreserved)
    spark.range(numSeeds).select(
      when(variant === 0, dupOfPrev).when(variant === 1, denorm).otherwise(base).as("url"),
      (lit(1) + pmod(xxhash64(lit("prio"), i), lit(3))).cast("int").as("priority"),
      timestamp_seconds(lit(1700000000L) + i).as("discovery_time"))
  }

  /**
   * CDX reference table (J3 analog, dedupe.go:52-94): ~1/10 of content
   * classes have a prior capture in the "wayback" index. Digest must equal
   * the live payload digest for a hit, so it is computed from the same spans.
   */
  def cdx(spark: SparkSession, n: Long, numHosts: Int = 50, hotPermille: Int = 100): DataFrame = {
    val p = pages(spark, n, numHosts, hotPermille)
    p.filter(pmod(xxhash64(lit("cdx"), col("cls")), lit(10)) === 0)
      .select(
        col("url_key"),
        lit("20220320002518").as("ts_compact"), // golden ts shape, client_test.go:919
        col("url").as("uri"),
        lit("text/html").as("mime"),
        lit("200").as("status"),
        warc_sha1_b32(payloadExpr(col("spans"))).as("digest"),
        length(payloadExpr(col("spans"))).cast("long").as("size"))
      .dropDuplicates("digest")
  }

  /** Doppelganger reference table (J4 analog, dedupe.go:96-142): a disjoint ~1/10 slice. */
  def doppelganger(spark: SparkSession, n: Long, numHosts: Int = 50, hotPermille: Int = 100): DataFrame = {
    val p = pages(spark, n, numHosts, hotPermille)
    p.filter(pmod(xxhash64(lit("dopp"), col("cls")), lit(10)) === 1)
      .select(
        warc_sha1_b32(payloadExpr(col("spans"))).as("digest"),
        concat(lit("<urn:uuid:dg-"), lower(hex(xxhash64(col("cls")))), lit(">")).as("id"),
        col("url").as("uri"),
        lit(20220101000000L).as("date_compact"))
      .dropDuplicates("digest")
  }

  /**
   * robots.txt rules (RFC 9309; no reference fixture — gowarc has no robots
   * support, so these goldens are spec-derived per FIXTURES.md §3).
   * Every 7th host disallows the path prefix "/p1"; host0 (hot) allows all
   * but disallows "/p2" to keep the hot-host pressure realistic.
   */
  def robots(spark: SparkSession, numHosts: Int = 50): DataFrame = {
    val h = col("id")
    spark.range(numHosts).select(
      concat(lit("host"), h.cast("string"), lit(".example")).as("host"),
      lit("*").as("user_agent"),
      lit("disallow").as("rule_type"),
      when(h === 0, lit("/p2")).when(pmod(h, lit(7)) === 3, lit("/p1")).otherwise(lit(null)).as("path_prefix"))
      .filter(col("path_prefix").isNotNull)
  }

  /** DNS fixture (J5 analog, dns.go:19-82): host -> deterministic fake A/AAAA. */
  def dns(spark: SparkSession, numHosts: Int = 50): DataFrame = {
    val h = col("id")
    spark.range(numHosts).select(
      concat(lit("host"), h.cast("string"), lit(".example")).as("host"),
      concat(lit("10."), pmod(h, lit(256)).cast("string"), lit(".0.1")).as("ipv4"),
      concat(lit("fd00::"), lower(hex(pmod(h, lit(65536))))).as("ipv6"))
  }

  /**
   * Canonical payload serialization of a spans array: "kind|text|media_ref"
   * joined by \n. This is the engine's deterministic analog of the HTTP
   * payload bytes the reference digests (write.go:96-101); span order is the
   * array order, so payload equality == span-sequence equality.
   */
  def payloadExpr(spans: Column): Column =
    concat_ws("\n", transform(spans,
      s => concat_ws("|", s.getField("kind"), s.getField("text"), s.getField("media_ref"))))

  /** The same spans rendered as an HTML document — the payload the crawl's
    * `parseLinks` mode fetches, so link discovery must go through the REAL
    * extract → RFC 3986 resolve → canonicalize path instead of exploding
    * pre-tokenized spans. Media refs render as a `data-ref` attribute
    * (not `src`): a `media://` pseudo-scheme is fixture plumbing, not a
    * dereferenceable outlink, and must stay out of the frontier. */
  def htmlPayloadExpr(spans: Column): Column =
    concat(lit("<html><body>"), concat_ws("", transform(spans, s =>
      when(s.getField("kind") === "link",
        concat(lit("<a href=\""), s.getField("text"), lit("\">l</a>")))
        .when(s.getField("kind") === "media",
          concat(lit("<object data-ref=\""), s.getField("media_ref"), lit("\"></object>")))
        .otherwise(concat(lit("<p>"), s.getField("text"), lit("</p>"))))),
      lit("</body></html>"))

  /** Synthetic HTTP response header block (the revisit truncation target, X2). */
  def headersExpr(payload: Column): Column =
    concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "),
      length(payload).cast("string"), lit("\r\n\r\n"))

  /** Seeds normalized into frontier shape for round 0. */
  def seedFrontier(seedsDf: DataFrame): DataFrame =
    seedsDf.select(
      col("url"),
      url_canonicalize(col("url")).as("url_key"),
      parse_url(url_canonicalize(col("url")), lit("HOST")).as("host"),
      col("priority"),
      col("discovery_time"),
      lit(0).as("depth"),
      lit("seed").as("via"))
}
