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
 * Sharding: shard = floorMod(xxhash64(url_key), P). The same key hashing
 * partitions the exact table, so shard filters co-locate with their data
 * files in the snapshot layer and merge independently per round. At the
 * 10^10-URL design point: P=1024 shards x ~12 MB blocked-Bloom each
 * (10 bits/key) — each executor holds only the shards it probes.
 */
object SeenSetOps {

  val HASH_SEED = "graft-seen" // fixed salt column for key hashing

  def keyHash(keyCol: Column): Column = xxhash64(lit(HASH_SEED), keyCol)

  /** One filter pair per shard, built map-side-parallel in a single pass. */
  case class ShardedFilters(numShards: Int,
                            bloom: Array[Array[Byte]],
                            cuckoo: Array[Array[Byte]]) extends Serializable {
    def bloomFilter: PartitionedFilter =
      new PartitionedFilter(bloom.map(b => BlockedBloom.deserialize(b): MembershipFilter))
    def cuckooFilter: PartitionedFilter =
      new PartitionedFilter(cuckoo.map(b => CuckooFilter.deserialize(b): MembershipFilter))

    /** OR/absorb another round's shard filters into this one. */
    def merge(other: ShardedFilters): ShardedFilters = {
      require(other.numShards == numShards)
      val b = bloom.zip(other.bloom).map { case (x, y) =>
        BlockedBloom.deserialize(x).or(BlockedBloom.deserialize(y)).serialize() }
      val c = cuckoo.zip(other.cuckoo).map { case (x, y) =>
        CuckooFilter.deserialize(x).absorb(CuckooFilter.deserialize(y)).serialize() }
      ShardedFilters(numShards, b, c)
    }
  }

  /**
   * Build shard filters from a key column in one aggregation (partial
   * filter-build map-side; only P filter blobs cross the shuffle).
   * Returns the key count alongside — callers use it instead of a separate
   * count() job (one Spark job + one codegen'd plan fewer per round).
   */
  def buildFiltersCounted(keys: DataFrame, keyCol: String, numShards: Int,
                          blocksPerShard: Int, cuckooBucketsPerShard: Int): (ShardedFilters, Long) = {
    val h = keyHash(col(keyCol))
    val rows = keys
      .select(h.as("h"), pmod(h, lit(numShards.toLong)).cast("int").as("shard"))
      .groupBy("shard")
      .agg(
        FilterExprs.bloom_agg(col("h"), blocksPerShard).as("bloom"),
        FilterExprs.cuckoo_agg(col("h"), cuckooBucketsPerShard).as("cuckoo"),
        count(lit(1)).as("n"))
      .collect()
    val bloom = Array.fill(numShards)(BlockedBloom(blocksPerShard).serialize())
    val cuckoo = Array.fill(numShards)(CuckooFilter(cuckooBucketsPerShard).serialize())
    var total = 0L
    rows.foreach { r =>
      val s = r.getInt(0)
      bloom(s) = r.getAs[Array[Byte]](1)
      cuckoo(s) = r.getAs[Array[Byte]](2)
      total += r.getAs[Long](3)
    }
    (ShardedFilters(numShards, bloom, cuckoo), total)
  }

  def buildFilters(keys: DataFrame, keyCol: String, numShards: Int,
                   blocksPerShard: Int, cuckooBucketsPerShard: Int): ShardedFilters =
    buildFiltersCounted(keys, keyCol, numShards, blocksPerShard, cuckooBucketsPerShard)._1

  /**
   * candidates \ seen (the NOT-EXISTS of SURVEY §2.4): filter-accelerated
   * left_anti join. Definite-misses (filter says "never seen") bypass the
   * join; only maybe-seen rows shuffle against the exact table.
   */
  def notSeen(candidates: DataFrame, keyCol: String,
              filters: Option[MembershipFilter], exactSeen: DataFrame): DataFrame = {
    filters match {
      case None => candidates.join(exactSeen, Seq(keyCol), "left_anti")
      case Some(f) =>
        val maybe = FilterExprs.might_contain(f, keyHash(col(keyCol)))
        candidates.filter(!maybe)
          .unionByName(candidates.filter(maybe).join(exactSeen, Seq(keyCol), "left_anti"))
    }
  }
}
