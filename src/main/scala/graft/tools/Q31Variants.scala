package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.web.SyntheticWeb

/** q31 config-variant timing: stats on/off × concurrent jobs on/off.
  * Outputs are invariant (collectStats only gates side counters; concurrent
  * mode only overlaps job submission) — asserted here by count+hash. */
object Q31Variants {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 500L
    def run(collectStats: Boolean, concurrent: Boolean): (Long, String) = {
      val res = graft.jobs.Crawl.run(spark, SyntheticWeb.pages(spark, n),
        SyntheticWeb.seeds(spark, 200, n),
        Some(SyntheticWeb.robots(spark)), Some(SyntheticWeb.doppelganger(spark, n)),
        Some(SyntheticWeb.cdx(spark, n)),
        graft.jobs.Crawl.Config(maxRounds = 2, perHostBudget = 40, numSlots = 8,
          dedupSizeThreshold = 32, numShards = 4,
          collectStats = collectStats, concurrentJobs = concurrent),
        dns = Some(SyntheticWeb.dns(spark)))
      val out = res.warcRows
        .groupBy(col("round"), col("warc_type"), col("dedupe_source"))
        .agg(count(lit(1)).as("n"), sum(col("content_length")).as("bytes"))
        .orderBy("round", "warc_type", "dedupe_source")
      val rows = out.collect().map(_.toString).mkString("|")
      (rows.length.toLong, java.security.MessageDigest.getInstance("MD5")
        .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
    // warm once
    run(collectStats = true, concurrent = false)
    for ((cs, cj) <- Seq((true, false), (false, false), (true, true), (false, true));
         rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val (len, h) = run(cs, cj)
      println(f"stats=$cs concurrent=$cj rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s hash=$h len=$len")
    }
    spark.stop()
  }
}
