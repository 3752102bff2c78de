package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: pure-compute scaling ceiling of this box under Spark local
  * mode (no shuffle, no driver round-trips) — separates hardware/JVM limits
  * from job-structure limits when reading ScalingBench numbers. */
object CoreScaling {
  private def run(cores: Int, n: Long, partsPerCore: Int): Double = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * partsPerCore)
      .config("spark.default.parallelism", cores * partsPerCore)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      val df = s.range(0, n, 1, cores * partsPerCore).select(
        sum(pmod(xxhash64(sha2(concat(lit("x"), col("id").cast("string")), 256)), lit(1000L))).as("h"))
      df.head() // warm
      val t0 = System.nanoTime()
      df.head()
      (System.nanoTime() - t0) / 1e9
    } finally s.stop()
  }
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("CS_ROWS", "30000000").toLong
    val levels = sys.env.getOrElse("CS_LEVELS", "8,32").split(",").map(_.trim.toInt)
    val ppc = sys.env.getOrElse("CS_PARTS_PER_CORE", "1").toInt
    val out = levels.map { c => val t = run(c, n, ppc); println(f"cores=$c t=$t%.2f thr=${n / t / 1e6}%.1f Mrows/s"); (c, t) }
    println(out.map { case (c, t) => s"$c:$t" }.mkString("RESULT ", " ", ""))
  }
}
