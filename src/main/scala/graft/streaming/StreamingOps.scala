package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One fetch event on the live capture stream (the reference's per-connection
  * record flow, dialer.go:473-643, as a row). */
case class FetchEvent(ts: Timestamp, url: String, digest: String, size: Long, status: Int)

/** Streaming dedup verdict: first capture of a digest is the `response`;
  * every later capture is a `revisit` referring back to it (dedupe.go:36-50). */
case class DedupVerdict(url: String, digest: String, warcType: String,
                        refersToUrl: String, ts: Timestamp)

/** State carried per digest: the first capture (first-wins insert,
  * dialer.go:616-633). */
case class FirstCapture(url: String, ts: Timestamp)

/**
 * Structured Streaming forms of the crawl pipeline's stateful pieces
 * (SURVEY §2.8). The reference IS a streaming pipeline — teed connection
 * bytes, concurrent parsers, a writer pool fed by channels — and these
 * operators are its Spark-native equivalents: event-time watermarks replace
 * channel backpressure, `flatMapGroupsWithState` replaces the in-process
 * dedup cache, windowed aggregation replaces the atomic metric counters.
 *
 * The batch engine (jobs.Crawl) remains the primary design (closed rounds +
 * snapshot commits, SURVEY §7.2); this module exists so a live capture feed
 * (`readStream` from Kafka/files in production) runs through the same
 * semantics with streaming state.
 */
object StreamingOps {

  /**
   * A1 counters as a live windowed aggregation: per (window, status) fetch
   * count and byte total, with a watermark bounding state. Late events past
   * the watermark are dropped — the streaming analog of "a round is a closed
   * set" (SURVEY §2.8).
   */
  def windowedFetchMetrics(events: DataFrame,
                           watermarkDelay: String = "10 minutes",
                           windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("status"))
      .agg(count(lit(1)).as("n"), sum(col("size")).as("bytes"))
      .select(col("window.start").as("window_start"), col("status"), col("n"), col("bytes"))

  /**
   * Streaming first-wins digest dedup: `flatMapGroupsWithState` keyed by
   * payload digest. The first event of a digest emits a `response` verdict
   * and installs state; later events emit `revisit` verdicts referencing the
   * first capture — exactly the local dedup tier (J1/J2) with unbounded
   * stream input. State per key is one (url, ts) pair, so at 10^10 digests
   * state stores shard across executors like the batch seen-set.
   *
   * Within one micro-batch, arrival order per key is made deterministic by
   * sorting the group's events by (ts, url) before classification.
   */
  def firstWinsDedup(events: Dataset[FetchEvent]): Dataset[DedupVerdict] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.digest)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        classifyGroup)
  }

  private[streaming] def classifyGroup(
      digest: String, events: Iterator[FetchEvent],
      state: GroupState[FirstCapture]): Iterator[DedupVerdict] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.url))
    var first = state.getOption
    val out = sorted.map { e =>
      first match {
        case Some(f) =>
          DedupVerdict(e.url, digest, "revisit", f.url, e.ts)
        case None =>
          first = Some(FirstCapture(e.url, e.ts))
          DedupVerdict(e.url, digest, "response", null, e.ts)
      }
    }
    first.foreach(state.update)
    out.iterator
  }

  /**
   * Streaming per-host politeness budget: `flatMapGroupsWithState` keyed by
   * host with a lifetime emitted-count per host — W5's ranking-window top-k
   * as unbounded-stream state. Events within a micro-batch are ordered
   * deterministically (ts, url_key) before the budget is applied; once a
   * host's budget is exhausted, its later candidates are dropped for the
   * stream's lifetime (the batch engine's per-round budget is the
   * round-scoped variant).
   */
  def hostBudget(candidates: Dataset[(String, String, Timestamp)],
                 budget: Long): Dataset[(String, String, Timestamp)] = {
    import candidates.sparkSession.implicits._
    candidates
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (host: String, rows: Iterator[(String, String, Timestamp)],
         state: GroupState[Long]) => {
          val used = state.getOption.getOrElse(0L)
          val room = math.max(0L, budget - used)
          val take = rows.toSeq.sortBy(r => (r._3.getTime, r._1))
            .take(math.min(room, Int.MaxValue.toLong).toInt)
          if (take.nonEmpty) state.update(used + take.size)
          take.iterator
        })
  }

  /**
   * The composed streaming frontier: raw candidate URLs -> RFC 3986
   * canonicalization -> URL-seen first-sighting dedup -> per-host politeness
   * budget. The live-feed (`readStream`) equivalent of Scheduler.schedule's
   * canonicalize -> notSeen -> budget chain, with the seen set and host
   * budgets as streaming state instead of snapshot tables.
   */
  def frontierStream(raw: DataFrame, budgetPerHost: Long): Dataset[(String, String, Timestamp)] = {
    import raw.sparkSession.implicits._
    val canon = raw.select(
      graft.functions.UrlCanonicalize.url_canonicalize(col("url")).as("url_key"),
      col("ts"))
      .withColumn("host", parse_url(col("url_key"), lit("HOST")))
      .select(col("url_key"), col("host"), col("ts"))
      .as[(String, String, Timestamp)]
    // first sighting per url_key, host carried in the emitted tuple
    val fresh = canon
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[(String, String, Timestamp)],
         state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator(rows.toSeq.minBy(r => (r._3.getTime, r._2)))
          }
        })
    hostBudget(fresh, budgetPerHost)
  }

  /**
   * Streaming WARC sink: `writeStream.foreachBatch` -> the DSv2 WARC writer
   * (Hadoop FileSystem I/O + BatchWrite commit protocol — cluster-correct on
   * hdfs://, s3a://, etc, unlike the java.nio `WarcSink`), one
   * SUBDIRECTORY of rotated files per micro-batch (`<dir>/batch=<id>`). The
   * reference's writer pool consumes a live channel (warc.go:149-256); here
   * each micro-batch is a closed channel drain. A REPLAYED batch (failure
   * recovery) writes mode("overwrite") into ITS OWN subdirectory, replacing
   * exactly its own files — end-to-end exactly-once file sets on top of the
   * engine's at-least-once replay. The batch scan and the streaming source
   * both list recursively, so the partitioned layout reads back as one
   * archive.
   *
   * `records` must carry the sink row shape (version, headers, content) —
   * use [[graft.sources.WarcSink.toRecordColumns]] upstream. Start with
   * `.start()` / await on the returned query builder.
   */
  def warcFileSink(records: DataFrame, dir: String, prefix: String = "GRAFT",
                   compression: String = "gzip", tsCompact: String = "20231114221320000",
                   maxRecordsPerFile: Int = 100000, host: String = "stream")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    records.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.toDF().write.format("graft.sources.WarcDataSource")
          .mode("overwrite") // truncates only this batch's subdirectory
          .option("prefix", s"$prefix-b$batchId")
          .option("tsCompact", tsCompact)
          .option("compression", compression)
          .option("maxRecordsPerFile", maxRecordsPerFile.toString)
          .option("host", host)
          .save(s"$dir/batch=$batchId")
      }

  /**
   * Streaming URL-seen: `mapGroupsWithState` keyed by url_key emitting each
   * key exactly once (its first sighting) — the frontier's NOT-EXISTS as
   * streaming state. Duplicate sightings update a counter but emit nothing
   * new (emitted flag in state).
   */
  def firstSightings(urls: Dataset[(String, Timestamp)]): Dataset[(String, Timestamp)] = {
    import urls.sparkSession.implicits._
    urls
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[(String, Timestamp)], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val firstTs = rows.map(_._2).minBy(_.getTime)
            Iterator((key, firstTs))
          }
        })
  }
}
