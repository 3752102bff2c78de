package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.WarcDigest.warc_blake3

/** Probe warc_blake3 at the column surface: golden value, null, large input. */
object Blake3Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(Some("hello world"), None, Some("x" * 3000)).toDF("t")
    df.select(col("t").isNull.as("is_null"), warc_blake3(col("t")).as("d"))
      .collect().foreach(r => println(s"null=${r.getBoolean(0)} digest=${if (r.isNullAt(1)) "NULL" else r.getString(1)}"))
    spark.stop()
  }
}
