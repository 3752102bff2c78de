package graft.tools

/**
 * Raw memory-read bandwidth at N threads (no Spark, no shuffle): each thread
 * streams its OWN 256 MB long array (working set >> L3, so every pass is
 * DRAM traffic). The 8 vs 32 ratio is the box's bandwidth scaling — the
 * hardware floor for any bandwidth-bound stage (BENCH/BASELINE.md evidence:
 * the crawl's per-task slowdown at 32-way concurrency is expected when
 * total bandwidth plateaus past 8 threads).
 *
 * Run pinned: `taskset -c 0-7 ... MemBandwidth 8`, `taskset -c 0-31 ... 32`.
 */
object MemBandwidth {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 8
    // default 256 MB/thread (pure DRAM); set MEMBW_WORDS to size the
    // per-thread working set against the SHARED L3 (260 MB on this box):
    // e.g. 3M words = 24 MB/thread -> 8 threads fit L3, 32 threads spill —
    // the cache-contention mechanism behind per-task slowdown at high
    // concurrency, invisible to the pure-DRAM sweep
    val words = sys.env.getOrElse("MEMBW_WORDS", (32 * 1024 * 1024).toString).toInt
    val passes = sys.env.getOrElse("MEMBW_PASSES", "24").toInt
    val arrays = Array.fill(threads)(Array.tabulate(words)(i => i.toLong))
    val sink = new java.util.concurrent.atomic.AtomicLong()
    def sweep(): Double = { // returns seconds for `passes` full passes/thread
      val t0 = System.nanoTime()
      val ts = arrays.map { a =>
        val t = new Thread(() => {
          var s = 0L
          var p = 0
          val len = a.length
          val random = sys.env.get("MEMBW_MODE").contains("random")
          val stride = 9999991 % len // conditional-subtract wrap: no pow-2
          while (p < passes) {       // assumption, no per-access division
            if (random) {
              // large-prime stride defeats the prefetcher: every load is a
              // cache+TLB miss — the sort/hash-join access pattern
              var i = 0; var n = 0
              while (n < len / 8) {
                s += a(i)
                i += stride; if (i >= len) i -= len
                n += 1
              }
            } else {
              var i = 0
              while (i < a.length) { s += a(i); i += 8 } // stride 64 B: one line per load
            }
            p += 1
          }
          sink.addAndGet(s)
          ()
        })
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    sweep() // warm (page-in + JIT)
    val secs = sweep()
    val bytes = threads.toLong * passes * words * 8L
    println(s"""{"bench":"mem_bandwidth","threads":$threads,"gb_per_sec":${bytes / secs / 1e9},"secs":$secs,"sink":${sink.get != 0}}""")
  }
}
