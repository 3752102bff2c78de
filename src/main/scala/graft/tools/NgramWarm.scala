package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm q21 timing: run the full query three times in one JVM. */
object NgramWarm {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$sf/documents.parquet")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.ops.DedupOps.ngramJaccardPairs(df, "doc_id", "text", n = 2, threshold = 0.2).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
