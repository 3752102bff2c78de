package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Adaptive revisit policy — the incremental-crawl planner that consumes the
 * capture history the CDX index records (jobs/CdxIndex): URLs that change
 * often come due sooner, static URLs back off. The classic archive-crawler
 * wait-interval heuristic (Heritrix/browsertrix family) expressed
 * relationally:
 *
 *   interval = observed span / max(versions − 1, 1)   (mean time between
 *              observed content changes; single-version URLs get the span
 *              itself — "no change seen yet, wait at least as long again")
 *   next_due = last capture + clamp(interval, minInterval, maxInterval)
 *
 * Timestamps are NUMERIC seconds (callers convert calendar forms once at
 * the edge — calendar parsing is deliberately outside this op so the
 * arithmetic is engine-portable, q83).
 *
 * Scale shape: ONE aggregation per urlkey (count, exact distinct digests,
 * min/max ts — all map-side partial), then narrow arithmetic. No windows,
 * no ordering over capture history: change detection uses VERSION COUNT
 * (distinct digests), not adjacency, precisely so a hot URL with 10⁸
 * captures never serializes into one window partition. (Adjacency counts
 * A→B→A as two changes, version count as one — an accepted undercount,
 * documented here, that buys the windowless plan.)
 */
object Recrawl {

  /** Per-urlkey recrawl schedule from a capture history
    * `(urlkeyCol, tsCol numeric-seconds, digestCol)`. */
  def schedule(history: DataFrame, urlkeyCol: String, tsCol: String,
               digestCol: String, minInterval: Long = 3600L,
               maxInterval: Long = 30L * 24 * 3600): DataFrame = {
    require(minInterval >= 1 && maxInterval >= minInterval,
      s"need 1 <= minInterval <= maxInterval, got $minInterval/$maxInterval")
    history
      .groupBy(col(urlkeyCol).as("urlkey"))
      .agg(count(lit(1)).as("n_caps"),
        countDistinct(col(digestCol)).as("n_versions"),
        min(col(tsCol).cast("long")).as("first_ts"),
        max(col(tsCol).cast("long")).as("last_ts"))
      // floor BEFORE the clamp: Spark's double→long cast truncates while
      // DuckDB's rounds, so the one float (the division) is floored into
      // integer space explicitly on both sides (cross-engine div idiom)
      .withColumn("interval_s",
        greatest(lit(minInterval), least(lit(maxInterval),
          floor((col("last_ts") - col("first_ts")) /
            greatest(col("n_versions") - 1, lit(1L))).cast("long"))))
      .withColumn("next_due", col("last_ts") + col("interval_s"))
  }
}
