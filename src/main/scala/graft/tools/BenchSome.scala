package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a subset of SparkEntry queries: runMain graft.tools.BenchSome q21 q23 */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    spark.stop()
  }
}
