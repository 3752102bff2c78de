package graft.seen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The URL-seen set: an exact url_key table (ground truth, snapshot-persisted)
 * fronted by per-shard approximate filters (blocked Bloom + cuckoo). The
 * filters exist to *avoid shuffles*: a candidate whose hash the filter
 * definitely hasn't seen skips the exact anti-join entirely (no false
 * negatives), so at steady state only the small maybe-seen slice shuffles.
 *
 * Lifecycle (everything stays distributed — no blob ever rides the driver):
 *  - shard = pmod(xxhash64(url_key), P); the same hashing partitions the
 *    exact table, so shard filters co-locate with their data files.
 *  - build: one aggregation per round — partial filter build map-side, only
 *    P blobs cross the shuffle ([[buildFilterTable]]).
 *  - merge across rounds: `union.groupBy(shard).agg(bloom_merge_agg, ...)`
 *    ([[mergeFilterTables]]) — a P-row distributed job, NOT a driver loop.
 *  - probe: join the filter table onto candidates by shard and evaluate
 *    `might_contain_blob` ([[notSeen]]). Catalyst/AQE picks the join
 *    distribution from the table's size stats: at local/test scale the
 *    P-row table broadcasts (no candidate shuffle at all); at the 10^10-URL
 *    design point (P=1024 x ~12 MB blobs = 12.5 GB — far beyond any
 *    broadcast or driver heap) it becomes a shard-aligned shuffle join where
 *    each task holds ONLY the shards it probes. Either way the blob is
 *    deserialized once per shard per task (ShardFilterCache), never per row.
 */
object SeenSetOps {

  val HASH_SEED = "graft-seen" // fixed salt column for key hashing

  def keyHash(keyCol: Column): Column = xxhash64(lit(HASH_SEED), keyCol)

  /** A shard-keyed filter table: (shard int, bloom binary, cuckoo binary,
    * n long) with one row per shard that has ever received a key. */
  case class FilterTable(df: DataFrame, numShards: Int)

  /**
   * Build the round's shard filters in one aggregation (partial filter-build
   * map-side; only P filter blobs cross the shuffle). The per-shard key
   * count `n` rides along so callers get the round's total without a second
   * scan of the keys.
   *
   * Partial-buffer sizing: every map partition allocates (and serializes)
   * one fixed-size buffer PER SHARD IT TOUCHES, so the shuffled bytes are
   * ~mapPartitions x numShards x bufferSize regardless of key count. The key
   * scan therefore coalesces to ~core-count partitions first (hashing is
   * trivially cheap; the buffers are not), and the cuckoo filter — 8x the
   * bloom's bytes and probed by nothing in the scheduling path — is built
   * only when `includeCuckoo` (the bounded/deletable dedup-cache semantics;
   * the column stays in the schema as null so tables merge either way).
   */
  def buildFilterTable(keys: DataFrame, keyCol: String, numShards: Int,
                       blocksPerShard: Int, cuckooBucketsPerShard: Int,
                       includeCuckoo: Boolean = true): FilterTable = {
    val h = keyHash(col(keyCol))
    val buildParallelism = math.max(1, keys.sparkSession.sparkContext.defaultParallelism)
    val cuckooAgg =
      if (includeCuckoo) FilterExprs.cuckoo_agg(col("h"), cuckooBucketsPerShard)
      else first(lit(null).cast(org.apache.spark.sql.types.BinaryType), ignoreNulls = false)
    val df = keys
      .coalesce(buildParallelism)
      .select(h.as("h"), pmod(h, lit(numShards.toLong)).cast("int").as("shard"))
      .groupBy("shard")
      .agg(
        FilterExprs.bloom_agg(col("h"), blocksPerShard).as("bloom"),
        cuckooAgg.as("cuckoo"),
        count(lit(1)).as("n"))
    FilterTable(df, numShards)
  }

  /** Absorb `delta` into `base` shard-by-shard — distributed (P-row shuffle
    * of blobs only), replacing the round-1 driver-side merge loop. */
  def mergeFilterTables(base: FilterTable, delta: FilterTable): FilterTable = {
    require(base.numShards == delta.numShards, "shard count mismatch")
    val df = base.df.unionByName(delta.df)
      .groupBy("shard")
      .agg(
        FilterExprs.bloom_merge_agg(col("bloom")).as("bloom"),
        FilterExprs.cuckoo_merge_agg(col("cuckoo")).as("cuckoo"),
        sum(col("n")).as("n"))
    FilterTable(df, base.numShards)
  }

  /**
   * candidates \ seen (the NOT-EXISTS of SURVEY §2.4): filter-accelerated
   * left_anti join. Definite-misses (filter says "never seen") bypass the
   * join; only maybe-seen rows shuffle against the exact table. A left join
   * keeps candidates whose shard has no filter row (null blob probes the
   * empty filter -> definite miss).
   *
   * The definite-miss / maybe-seen split references `probed` twice, so the
   * upstream candidate plan evaluates in both union branches — DELIBERATELY.
   * The one exchange upstream (canonicalize's dedup aggregate) is written
   * ONCE and read by both branches via Catalyst's ReuseExchange (identical
   * exchange subtrees share shuffle files); everything after it — the robots
   * broadcast gate and the probe join against the <=numShards-row blob table
   * (broadcast) — is map-side, so the "double scan" re-runs cheap projections
   * only. Materializing the wide probed slice instead costs a full
   * write+read of every candidate row through the block manager. MEASURED on
   * the 4M-page scaling workload (round 3): a lazy localCheckpoint here
   * regressed the crawl 41% at 8 pinned cores and 78% at 32 (checkpoint I/O
   * serializes what the branch recompute overlaps); recompute-over-
   * materialize is the scale-safe default, Spark's own lineage philosophy.
   * `materializeProbe = true` remains for callers whose candidate plan is
   * genuinely expensive to re-evaluate (e.g. cold object-storage scans
   * without a cached frontier).
   */
  def notSeen(candidates: DataFrame, keyCol: String,
              filters: Option[FilterTable], exactSeen: DataFrame,
              materializeProbe: Boolean = false): DataFrame = {
    filters match {
      case None => candidates.join(exactSeen, Seq(keyCol), "left_anti")
      case Some(ft) =>
        val h = keyHash(col(keyCol))
        val probedPlan = candidates
          .withColumn("__h", h)
          .withColumn("__shard", pmod(col("__h"), lit(ft.numShards.toLong)).cast("int"))
          .join(ft.df.select(col("shard").as("__shard"), col("bloom").as("__bloom")),
            Seq("__shard"), "left")
          .withColumn("__maybe",
            FilterExprs.might_contain_blob(col("__shard"), col("__bloom"), col("__h")))
        val probed =
          if (materializeProbe) probedPlan.localCheckpoint(eager = false) else probedPlan
        val aux = Seq("__h", "__shard", "__bloom", "__maybe")
        probed.filter(!col("__maybe")).drop(aux: _*)
          .unionByName(
            probed.filter(col("__maybe")).drop(aux: _*)
              .join(exactSeen, Seq(keyCol), "left_anti"))
    }
  }
}
