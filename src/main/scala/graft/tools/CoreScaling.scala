package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: pure-compute scaling ceiling of this box (no shuffle, no
  * driver round-trips) — separates hardware limits from job-structure limits
  * when reading ScalingBench numbers. Not part of the engine. */
object CoreScaling {
  private def run(cores: Int, n: Long): Double = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      val df = s.range(n).select(
        sum(pmod(xxhash64(sha2(concat(lit("x"), col("id").cast("string")), 256)), lit(1000L))).as("h"))
      df.head() // warm
      val t0 = System.nanoTime()
      df.head()
      (System.nanoTime() - t0) / 1e9
    } finally s.stop()
  }
  def main(args: Array[String]): Unit = {
    val n = 30000000L
    val t8 = run(8, n)
    val t32 = run(32, n)
    println(f"{'compute_t8': $t8%.2f, 'compute_t32': $t32%.2f, 'speedup': ${t8 / t32}%.2f, 'eff': ${t8 / t32 / 4}%.3f}")
  }
}
