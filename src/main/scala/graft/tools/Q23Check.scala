package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm q23 timing + an order-insensitive md5 of the full output — the
  * byte-identical harness for candidate-pruning changes to minhashLshPairs
  * (run before and after; the hash must not move). */
object Q23Check {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$sf/documents.parquet")
    def run() = graft.ops.DedupOps.minhashLshPairs(df, "doc_id", "text",
      shingleSize = 5, numHashes = 32, bandsCount = 8, threshold = 0.4)
    run().count() // warm
    val t0 = System.nanoTime()
    val rows = run().collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map(_.toString).sorted.foreach(s => md.update(s.getBytes("UTF-8")))
    println(f"q23 warm: $secs%.2f s rows=${rows.length} md5=${md.digest().map(b => f"$b%02x").mkString}")
    spark.stop()
  }
}
