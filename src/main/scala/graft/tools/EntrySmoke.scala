package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: SparkEntry.entry rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows = $n (schema: ${df.columns.take(8).mkString(",")}...)")
    require(n > 0, "driver smoke would fail")
    spark.stop()
  }
}
