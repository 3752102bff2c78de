package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The whole engine as ONE pipeline — what a training-data team actually
 * runs: crawl a (synthetic) web with three-tier dedup -> write real
 * `.warc.zst` archives through the DSv2 sink -> scan them back -> exact +
 * near-dup dedup with cluster resolution -> language/quality filter ->
 * training-set parquet. Every stage is the library's public API; the only
 * fake part is the web itself.
 */
object TrainingPipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.web.SyntheticWeb

    // 1) crawl: schedule -> fetch -> three-tier dedup -> warc rows.
    // Robots arrive as RAW per-host robots.txt bodies (the form a crawl
    // actually fetches) and go through the RFC 9309 group parser into the
    // gate's structured shape — the producer side of the robots pipeline
    val n = 400L
    val robotsRaw = SyntheticWeb.robots(spark).select(col("host"),
      concat(lit("# synthetic robots\nUser-agent: *\nDisallow: "),
        col("path_prefix")).as("body"))
    val robotsRules = graft.frontier.Scheduler.parseRobots(robotsRaw)
    val crawl = graft.jobs.Crawl.run(spark, SyntheticWeb.pages(spark, n),
      SyntheticWeb.seeds(spark, 120, n), Some(robotsRules),
      None, None,
      graft.jobs.Crawl.Config(maxRounds = 2, perHostBudget = 40, numSlots = 8,
        dedupSizeThreshold = 32, numShards = 4))
    println(s"crawl: ${crawl.warcRows.count()} warc rows over ${crawl.rounds.size} rounds")

    // 2) archive: rotated .warc.zst through the DSv2 commit protocol
    // (warc_rows carry digests/lengths; bodies join back from the fetched
    // page table, as the capture path streamed them)
    val warcDir = java.nio.file.Files.createTempDirectory("pipeline-warc").toString
    // every rendered page carries the same nav banner line (the reality
    // boilerplate removal exists for), then one line per text span
    val pageText = SyntheticWeb.pages(spark, n).select(col("url").as("target_uri"),
      concat(lit("site nav menu home about contact\n"),
        concat_ws("\n", transform(filter(col("spans"), s => s.getField("kind") === "text"),
          s => s.getField("text")))).as("content"))
    val responses = crawl.warcRows.filter(col("warc_type") === "response")
      .join(pageText, Seq("target_uri"))
    graft.sources.WarcSink.toRecordColumns(responses, "content", keepDigests = false)
      .write.format("graft.sources.WarcDataSource").mode("append")
      .option("compression", "zstd").save(warcDir)

    // 3) scan back (pushdown: responses only) and shape documents
    val docs = spark.read.format("graft.sources.WarcDataSource").load(warcDir)
      .filter(col("warc_type") === "response")
      .select(col("record_id").as("doc_id"), col("content").cast("string").as("text"))
    println(s"archive scan: ${docs.count()} response records")

    // 3b) WET derivative: conversion records (extracted text, refers-to
    // back-pointers, digests recomputed by the sink) from the same archive
    val wetDir = java.nio.file.Files.createTempDirectory("pipeline-wet").toString
    graft.jobs.Wet.write(spark, warcDir, wetDir)
    println(s"wet: ${spark.read.format("graft.sources.WarcDataSource").load(wetDir)
      .filter(col("warc_type") === "conversion").count()} conversion records")

    // 3c) WAT derivative: metadata records with the JSON envelope (WARC
    // headers + HTTP summary + HTML head/links) from the same archive
    val watDir = java.nio.file.Files.createTempDirectory("pipeline-wat").toString
    graft.jobs.Wat.write(spark, warcDir, watDir)
    println(s"wat: ${spark.read.format("graft.sources.WarcDataSource").load(watDir)
      .filter(col("warc_type") === "metadata").count()} metadata records")

    // 3d) CDX index: the replay/lookup index over the same archive (sorted
    // SURT keys + member offsets — what the next crawl's CDX tier consumes)
    val cdxDir = java.nio.file.Files.createTempDirectory("pipeline-cdx").toString
    graft.jobs.CdxIndex.write(spark, warcDir, cdxDir)
    println(s"cdx: ${spark.read.text(cdxDir).count()} index lines")
    // ... and the query side: replay the index through a nearest-capture lookup
    val cdxParsed = graft.jobs.CdxIndex.parse(spark.read.text(cdxDir))
    val lookups = cdxParsed.select(col("original").as("url"),
      (col("timestamp").cast("long") + 5).as("ts")).limit(5)
    println(s"cdx lookup: ${graft.jobs.CdxIndex.nearestCaptures(cdxParsed, lookups).count()} " +
      "nearest captures resolved")
    // ... and the maintenance side: an adaptive recrawl schedule from the
    // same capture history (single-crawl history -> min-interval clamp)
    val recrawlDue = graft.frontier.Recrawl.schedule(
      cdxParsed.select(col("urlkey"),
        unix_timestamp(to_timestamp(col("timestamp"), "yyyyMMddHHmmss")).as("ts"),
        col("digest")), "urlkey", "ts", "digest")
    println(s"recrawl: ${recrawlDue.count()} urls scheduled, min interval " +
      s"${recrawlDue.agg(min("interval_s")).head().getLong(0)} s")

    // 3d-ii) zipnum: the sharded secondary index over the same CDX (what a
    // wayback front-end binary-searches at 100 TB scale)
    val zipDir = java.nio.file.Files.createTempDirectory("pipeline-zipnum").toString
    val zipBlocks = graft.jobs.CdxIndex.writeZipnum(spark, warcDir, zipDir, blockLines = 20)
    println(s"zipnum: ${zipBlocks.count()} blocks across " +
      s"${zipBlocks.select("shard").distinct().count()} shards")

    // 3d-iii) retroactive dedup: compact the archive (duplicate payloads ->
    // revisits referencing the earliest capture), then resolve it back for
    // replay — the storage/replay cycle over the same files
    val compactDir = java.nio.file.Files.createTempDirectory("pipeline-compact").toString
    graft.jobs.Compact.write(spark, warcDir, compactDir, sizeThreshold = 1)
    val cScan = spark.read.format("graft.sources.WarcDataSource").load(compactDir)
    println(s"compact: ${cScan.filter(col("warc_type") === "response").count()} responses + " +
      s"${cScan.filter(col("warc_type") === "revisit").count()} revisits " +
      s"(resolve restores ${graft.jobs.Compact.resolveRows(spark, compactDir)
        .filter(col("headers")("WARC-Type") === "response").count()} full responses)")

    // 3e) link graph: page outlinks -> host edges -> PageRank (the
    // crawl-prioritization signal for the next round's frontier ordering)
    val pageLinks = SyntheticWeb.pages(spark, n).select(col("url").as("src_url"),
      explode(transform(filter(col("spans"), s => s.getField("kind") === "link"),
        s => s.getField("text"))).as("dst_url"))
    val hostRanks = graft.ops.GraphOps.pageRank(
      graft.ops.GraphOps.hostEdges(pageLinks, "src_url", "dst_url"), "src", "dst",
      iterations = 5)
    val top = hostRanks.orderBy(desc("rank")).limit(1).collect().head
    println(f"pagerank: ${hostRanks.count()} hosts ranked, top=${top.getString(0)}@${top.getDouble(1)}%.3f")

    // 3e-ii) close the loop: the NEXT crawl consumes the ranks — rank-
    // boosted hosts take the capped budget first
    val crawl2 = graft.jobs.Crawl.run(spark, SyntheticWeb.pages(spark, n),
      SyntheticWeb.seeds(spark, 120, n), Some(robotsRules), None, None,
      graft.jobs.Crawl.Config(maxRounds = 2, perHostBudget = 40, numSlots = 8,
        dedupSizeThreshold = 32, numShards = 4, maxPerRound = 60),
      // scores scaled into the scheduler's log2 priority range (rank 3 vs 1
      // is one priority level; x100 spreads the hierarchy across levels)
      hostRanks = Some(hostRanks.withColumn("rank", col("rank") * 100)))
    val r1 = crawl2.warcRows.filter(col("seq") === 0 && col("round") === 1)
    val hot = r1.filter(col("host") === "host0.example").count()
    println(s"rank-prioritized crawl: ${r1.count()} capped round-1 fetches, " +
      s"$hot from the top-ranked host (rank boost puts its candidates first; " +
      "the strict-ordering proof lives in CrawlSpec)")

    // 3f) per-domain frequency cap (the RefinedWeb rule) over the scanned
    // archive — exact via the bounded kth-smallest aggregate, no hot-host window
    val hosted = spark.read.format("graft.sources.WarcDataSource").load(warcDir)
      .filter(col("warc_type") === "response")
      .select(col("record_id").as("doc_id"),
        parse_url(col("target_uri"), lit("HOST")).as("domain"))
    val capped = graft.ops.PipelineOps.capPerKey(hosted, "domain", "doc_id", 3)
    println(s"domain cap: ${hosted.count()} -> ${capped.count()} docs at <= 3 per host")

    // 4) dedup: exact fingerprints + near-dup pairs -> connected components
    val uniq = docs.withColumn("fp", graft.ops.TextOps.fingerprint(col("text")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("fp", "rn")
    val pairs = graft.ops.DedupOps.ngramJaccardPairs(uniq, "doc_id", "text",
      n = 2, threshold = 0.8, maxDocFreq = 50)
    // one representative per near-dup cluster (string record ids fine —
    // the helper hashes both sides consistently)
    val keep = graft.ops.DedupOps.keepClusterRepresentatives(uniq, pairs, "doc_id")
    println(s"dedup: ${docs.count()} -> ${uniq.count()} exact-unique -> ${keep.count()} after near-dup clusters")

    // 4b) boilerplate-line removal: lines shared across >= 25 docs drop
    // from every doc (the synthetic pages share templated nav text)
    val debp = graft.ops.TextOps.dropBoilerplateLines(keep, "doc_id", "text", minDocs = 25)
      .withColumnRenamed("clean", "bp_clean")
    val deboiled = keep.drop("text").join(debp.filter(col("n_kept") > 0), Seq("doc_id"))
      .withColumnRenamed("bp_clean", "text").drop("n_kept", "n_dropped")
    println(s"boilerplate: ${keep.count()} -> ${deboiled.count()} docs with kept lines " +
      s"(${debp.agg(sum("n_dropped")).head().getLong(0)} lines dropped)")

    // 5) language + LM-perplexity + quality gate, then the training table
    val outDir = java.nio.file.Files.createTempDirectory("pipeline-out").toString
    val ppl = graft.ops.TextOps.ngramLmPerplexity(deboiled, "doc_id", "text", minCount = 5)
      .select(col("doc_id"), col("ppl"))
    val pplCut = ppl.agg(expr("percentile_approx(ppl, 0.9)")).head().getDouble(0)
    val train = graft.ops.TextOps.langIdReport(deboiled, "text")
      .join(ppl, Seq("doc_id")) // CCNet-style: drop the worst-perplexity tail
      .filter(col("ppl") <= pplCut)
      .withColumn("quality", graft.ops.TextOps.qualityScore(col("text")))
      .withColumn("n_tokens", graft.ops.TextOps.tokenCount(col("text")))
      .filter(col("quality") >= 0.5) // synthetic words max out at 0.75 (no stopwords)
    train.write.mode("overwrite").parquet(outDir)
    val back = spark.read.parquet(outDir)
    println(s"training set: ${back.count()} docs, langs=" +
      back.groupBy("lang").count().orderBy("lang").collect()
        .map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(","))

    // 5b) DSIR: anchor on the top-quality slice as the target domain and
    // keep the docs whose token distribution matches it best (one scoring
    // pass under both LMs via lmLogProbQMulti)
    val tgt = back.filter(col("quality") >= 0.75).select(col("doc_id"), col("text"))
    val kSel = math.max((back.count() * 3 / 4).toInt, 1)
    val picked = graft.ops.TextOps.dsirSelect(
      back.select(col("doc_id"), col("text")), "doc_id", "text", tgt, k = kSel)
    val dsirKept = back.join(picked.select("doc_id"), Seq("doc_id"))
    println(s"dsir: ${back.count()} -> ${dsirKept.count()} selected " +
      s"(target = ${tgt.count()} high-quality docs)")

    // 6) corpus assembly: decontaminate vs a held-out eval slice, mix by
    // language quota, pack onto fixed token-budget sequences
    val eval = dsirKept.orderBy("doc_id").limit(5).select(col("text").as("eval_text"))
    val cleaned = graft.ops.PipelineOps
      .contaminationFlags(dsirKept, "doc_id", "text", eval, "eval_text", n = 4)
      .filter(!col("contaminated"))
    val mixed = graft.ops.PipelineOps.stratifiedSample(cleaned, "lang", "doc_id",
      Map("en" -> 1.0, "unknown" -> 0.5), defaultRate = 0.25)
    val packed = graft.ops.PipelineOps.packSequences(mixed, "doc_id", "doc_id",
      col("n_tokens"), budget = 512)
    val nSeqs = packed.agg(coalesce(max(col("seq_id")) + 1, lit(0L))).head().getLong(0)
    println(s"assembly: ${dsirKept.count()} -> ${cleaned.count()} decontaminated -> " +
      s"${mixed.count()} mixed -> $nSeqs packed sequences of 512 tokens")
    spark.stop()
  }
}
