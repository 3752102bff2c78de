package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.seen.{BlockedBloom, CuckooFilter, PartitionedFilter, MembershipFilter}

/**
 * Seen-set filter properties (SURVEY §5 "we add" row): the load-bearing
 * property is NO FALSE NEGATIVES — a false negative would silently re-crawl
 * or, worse, skip the exact anti-join for a seen URL.
 */
class FiltersSpec extends AnyFunSuite with GenHelpers {

  private def hashes(n: Int, seed: Long): Seq[Long] =
    (0 until n).map(i => scala.util.hashing.MurmurHash3.stringHash(s"$seed-$i").toLong * 0x9e3779b97f4a7c15L + i)

  test("blocked bloom: no false negatives at design load") {
    val keys = hashes(10000, 1)
    val bloom = BlockedBloom.sized(10000, bitsPerKey = 12)
    keys.foreach(bloom.put)
    assert(keys.forall(bloom.mightContain), "bloom false negative!")
  }

  test("blocked bloom: false positive rate sane at 12 bits/key") {
    val keys = hashes(20000, 2)
    val bloom = BlockedBloom.sized(20000, bitsPerKey = 12)
    keys.foreach(bloom.put)
    val probes = hashes(20000, 99)
    val fp = probes.count(bloom.mightContain).toDouble / probes.size
    assert(fp < 0.02, s"fp rate $fp too high for 12 bits/key")
  }

  test("blocked bloom: serde roundtrip and OR-merge preserve membership") {
    val a = BlockedBloom.sized(1000); val b = BlockedBloom.sized(1000)
    val ka = hashes(500, 3); val kb = hashes(500, 4)
    ka.foreach(a.put); kb.foreach(b.put)
    val merged = BlockedBloom.deserialize(a.serialize()).or(BlockedBloom.deserialize(b.serialize()))
    assert((ka ++ kb).forall(merged.mightContain))
  }

  test("cuckoo: insert/contains/delete") {
    val f = CuckooFilter.sized(10000)
    val keys = hashes(8000, 5)
    keys.foreach(k => assert(f.insert(k)))
    assert(keys.forall(f.mightContain), "cuckoo false negative after insert")
    // delete half, the other half must remain
    val (del, keep) = keys.splitAt(4000)
    del.foreach(f.delete)
    assert(keep.forall(f.mightContain), "cuckoo false negative after unrelated deletes")
  }

  test("cuckoo: absorb-merge preserves membership of both sides") {
    val a = CuckooFilter.sized(4000); val b = CuckooFilter.sized(4000)
    val ka = hashes(1500, 6); val kb = hashes(1500, 7)
    ka.foreach(a.insert); kb.foreach(b.insert)
    val merged = CuckooFilter.deserialize(a.serialize()).absorb(CuckooFilter.deserialize(b.serialize()))
    assert((ka ++ kb).forall(merged.mightContain))
  }

  test("cuckoo: deterministic build (same inserts => same bytes)") {
    val k = hashes(3000, 8)
    val f1 = CuckooFilter.sized(4000); val f2 = CuckooFilter.sized(4000)
    k.foreach(f1.insert); k.foreach(f2.insert)
    assert(java.util.Arrays.equals(f1.serialize(), f2.serialize()))
  }

  test("partitioned filter routes by floorMod and has no false negatives") {
    val shards = Array.tabulate(8)(_ => BlockedBloom.sized(2000): MembershipFilter)
    val pf = new PartitionedFilter(shards)
    val keys = hashes(5000, 9)
    keys.foreach(h => shards(pf.shardOf(h)).asInstanceOf[BlockedBloom].put(h))
    assert(keys.forall(pf.mightContain))
  }

  test("no false negatives (property over arbitrary longs)") {
    checkAll(Gen.listOfN(200, Gen.long), n = 50) { ks =>
      val bloom = BlockedBloom.sized(1000)
      val cuckoo = CuckooFilter.sized(1000)
      ks.foreach { k => bloom.put(k); cuckoo.insert(k) }
      assert(ks.forall(bloom.mightContain))
      assert(ks.forall(cuckoo.mightContain))
    }
  }
}
