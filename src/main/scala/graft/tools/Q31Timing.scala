package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm q31 with GRAFT_TIMING laps: run twice, read the second run's laps. */
object Q31Timing {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q31_crawl_round")(spark, "/root/testdata/sf0.1").count()
      println(f"q31 run$i total: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
