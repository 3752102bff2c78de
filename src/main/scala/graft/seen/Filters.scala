package graft.seen

import java.nio.ByteBuffer

/**
 * Membership structures for the URL-seen set (north rule: "partitioned
 * blocked Bloom filter plus cuckoo-filter URL-seen set"). These replace the
 * reference's in-process 1M-entry dedup cache (/root/reference/client.go:142-152)
 * with structures that shard across partitions: each url_key-range bucket owns
 * one filter; at 10^10 keys x 10 bits that is ~12.5 GB total, ~12 MB per
 * bucket at P=1024 — broadcastable per-executor, mergeable per-round.
 *
 * All code is hand-rolled (no Guava/Spark sketch dependency) so filters are
 * (a) deterministic, (b) byte-stable for snapshot persistence, (c) mergeable
 * across rounds with plain OR / re-insert.
 */
trait MembershipFilter extends Serializable {
  def mightContain(hash: Long): Boolean
}

object MembershipFilter {
  /** The filter of an empty key set: definitely-not-seen for every probe.
    * Used for shards no key ever hashed into (absent filter-table rows). */
  val Empty: MembershipFilter = new MembershipFilter {
    override def mightContain(hash: Long): Boolean = false
  }

  /** Deserialize a filter blob by its version tag (1 = blocked Bloom,
    * 2 = cuckoo) — the dispatch that lets a shard-keyed filter TABLE carry
    * either structure in one binary column. */
  def deserializeAny(bytes: Array[Byte]): MembershipFilter =
    ByteBuffer.wrap(bytes).getInt(0) match {
      case 1 => BlockedBloom.deserialize(bytes)
      case 2 => CuckooFilter.deserialize(bytes)
      case v => throw new IllegalArgumentException(s"unknown filter version $v")
    }
}

/**
 * Cache-line-blocked Bloom filter: k=8 probes confined to one 512-bit block
 * (one cache line), block chosen by the upper hash half — the standard
 * "blocked bloom" design (Putze/Sanders/Singler 2007). No false negatives;
 * FP rate ~ that of a classic filter at the same bits/key + a small blocking
 * penalty.
 */
final class BlockedBloom(val numBlocks: Int, val bits: Array[Long]) extends MembershipFilter {
  require(bits.length == numBlocks * 8, "block array mismatch")

  @inline private def blockOf(h: Long): Int =
    ((((h >>> 32) & 0xffffffffL) * numBlocks) >>> 32).toInt

  def put(h: Long): Unit = {
    val base = blockOf(h) * 8
    val h1 = h.toInt
    val h2 = (h >>> 32).toInt | 1 // odd => full-period probe stream
    var i = 0
    while (i < 8) {
      val idx = (h1 + i * h2) & 511
      bits(base + (idx >>> 6)) |= (1L << (idx & 63))
      i += 1
    }
  }

  override def mightContain(h: Long): Boolean = {
    val base = blockOf(h) * 8
    val h1 = h.toInt
    val h2 = (h >>> 32).toInt | 1
    var i = 0
    while (i < 8) {
      val idx = (h1 + i * h2) & 511
      if ((bits(base + (idx >>> 6)) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def or(other: BlockedBloom): BlockedBloom = {
    require(other.numBlocks == numBlocks, "cannot OR blooms of different size")
    var i = 0
    while (i < bits.length) { bits(i) |= other.bits(i); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + bits.length * 8)
    bb.putInt(1) // version
    bb.putInt(numBlocks)
    var i = 0
    while (i < bits.length) { bb.putLong(bits(i)); i += 1 }
    bb.array()
  }
}

object BlockedBloom {
  /** numBlocks for n expected keys at `bitsPerKey` (512-bit blocks). */
  def sized(expectedKeys: Long, bitsPerKey: Int = 12): BlockedBloom = {
    val blocks = math.max(1L, (expectedKeys * bitsPerKey + 511) / 512)
    apply(math.min(blocks, Int.MaxValue / 16).toInt)
  }
  def apply(numBlocks: Int): BlockedBloom = new BlockedBloom(numBlocks, new Array[Long](numBlocks * 8))
  def deserialize(bytes: Array[Byte]): BlockedBloom = {
    val bb = ByteBuffer.wrap(bytes)
    val ver = bb.getInt
    require(ver == 1, s"bad bloom version $ver")
    val numBlocks = bb.getInt
    val bits = new Array[Long](numBlocks * 8)
    var i = 0
    while (i < bits.length) { bits(i) = bb.getLong; i += 1 }
    new BlockedBloom(numBlocks, bits)
  }
}

/**
 * Cuckoo filter (Fan et al. 2014): 16-bit fingerprints, 4-slot buckets,
 * partial-key cuckoo hashing. Unlike the Bloom filter it supports DELETE and
 * bounded capacity — matching the reference's bounded first-wins dedup cache
 * semantics (client.go:142-152). Eviction choice is a deterministic function
 * of (fingerprint, kick count): no RNG anywhere, so builds are reproducible.
 */
final class CuckooFilter(val numBuckets: Int, val table: Array[Short]) extends MembershipFilter {
  require(Integer.bitCount(numBuckets) == 1, "numBuckets must be a power of 2")
  require(table.length == numBuckets * 4)
  private val mask = numBuckets - 1
  private var _size: Int = table.count(_ != 0)
  def size: Int = _size

  @inline private def fpOf(h: Long): Short = {
    val fp = ((h >>> 48) & 0xffff).toInt
    (if (fp == 0) 1 else fp).toShort
  }
  @inline private def mix(fp: Int): Int = (fp * 0x5bd1e995) >>> 1
  @inline private def i1Of(h: Long): Int = (h & 0xffffffffL).toInt & mask
  @inline private def altOf(i: Int, fp: Short): Int = (i ^ mix(fp & 0xffff)) & mask

  private def tryPlace(i: Int, fp: Short): Boolean = {
    val base = i * 4
    var s = 0
    while (s < 4) {
      if (table(base + s) == 0) { table(base + s) = fp; _size += 1; return true }
      s += 1
    }
    false
  }

  private def bucketHas(i: Int, fp: Short): Boolean = {
    val base = i * 4
    table(base) == fp || table(base + 1) == fp || table(base + 2) == fp || table(base + 3) == fp
  }

  /** Place fp reachable from bucket i (i or alt(i)), evicting if needed. */
  private def insertFp(i0: Int, fp0: Short): Boolean = {
    val alt0 = altOf(i0, fp0)
    if (bucketHas(i0, fp0) || bucketHas(alt0, fp0)) return true // idempotent set semantics
    if (tryPlace(i0, fp0) || tryPlace(alt0, fp0)) return true
    var fp = fp0
    var i = if ((fp & 1) == 0) i0 else alt0 // deterministic start side
    var n = 0
    while (n < 500) {
      val slot = ((fp & 0xffff) + n) & 3 // deterministic victim slot
      val base = i * 4
      val victim = table(base + slot)
      table(base + slot) = fp
      fp = victim
      i = altOf(i, fp)
      if (bucketHas(i, fp)) return true
      if (tryPlace(i, fp)) return true
      n += 1
    }
    false
  }

  /** Insert; returns false when the filter is saturated (caller = first-wins cache full). */
  def insert(h: Long): Boolean = insertFp(i1Of(h), fpOf(h))

  override def mightContain(h: Long): Boolean = {
    val fp = fpOf(h)
    val i1 = i1Of(h)
    bucketHas(i1, fp) || bucketHas(altOf(i1, fp), fp)
  }

  def delete(h: Long): Boolean = {
    val fp = fpOf(h)
    var i = i1Of(h)
    var pass = 0
    while (pass < 2) {
      val base = i * 4
      var s = 0
      while (s < 4) {
        if (table(base + s) == fp) { table(base + s) = 0; _size -= 1; return true }
        s += 1
      }
      i = altOf(i, fp)
      pass += 1
    }
    false
  }

  /** Merge = re-insert every stored fingerprint at its stored bucket (or its alt). */
  def absorb(other: CuckooFilter): CuckooFilter = {
    require(other.numBuckets == numBuckets, "cannot merge cuckoo filters of different size")
    var b = 0
    while (b < other.numBuckets) {
      var s = 0
      while (s < 4) {
        val fp = other.table(b * 4 + s)
        // full eviction-path insert; only true saturation drops (bounded-
        // capacity first-wins cache semantics, client.go:143-146)
        if (fp != 0) insertFp(b, fp)
        s += 1
      }
      b += 1
    }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + table.length * 2)
    bb.putInt(2) // version tag distinct from bloom
    bb.putInt(numBuckets)
    var i = 0
    while (i < table.length) { bb.putShort(table(i)); i += 1 }
    bb.array()
  }
}

object CuckooFilter {
  def sized(expectedKeys: Long): CuckooFilter = {
    // 4 slots/bucket at ~95% load
    var buckets = 1
    while (buckets.toLong * 4 * 95 / 100 < expectedKeys && buckets < (1 << 28)) buckets <<= 1
    apply(buckets)
  }
  def apply(numBuckets: Int): CuckooFilter = new CuckooFilter(numBuckets, new Array[Short](numBuckets * 4))
  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = ByteBuffer.wrap(bytes)
    val ver = bb.getInt
    require(ver == 2, s"bad cuckoo version $ver")
    val numBuckets = bb.getInt
    val table = new Array[Short](numBuckets * 4)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    new CuckooFilter(numBuckets, table)
  }
}

/**
 * Bucket-partitioned filter: bucket = floorMod(hash, P) — the same key-range
 * partitioning as the exact seen-set table, so a bucket's filter co-locates
 * with its parquet partition in the snapshot layer and merges shard-local.
 */
final class PartitionedFilter(val shards: Array[MembershipFilter]) extends MembershipFilter {
  @inline def shardOf(h: Long): Int = java.lang.Math.floorMod(h, shards.length.toLong).toInt
  override def mightContain(h: Long): Boolean = shards(shardOf(h)).mightContain(h)
}
