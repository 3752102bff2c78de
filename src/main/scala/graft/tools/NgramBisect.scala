package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object NgramBisect {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$sf/documents.parquet")
    def t3(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = mk.count()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }
    val toks = graft.ops.TextOps.tokens(col("text"))
    t3("inline-explode") {
      df.select(col("doc_id").as("id"), toks.as("toks"))
        .select(col("id"), explode(array_distinct(
          graft.ops.TextOps.wordNgramHashesFromTokens(col("toks"), 2))).as("g"))
    }
    t3("two-project-explode") {
      df.select(col("doc_id").as("id"), toks.as("toks"))
        .select(col("id"), array_distinct(
          graft.ops.TextOps.wordNgramHashesFromTokens(col("toks"), 2)).as("grams"))
        .select(col("id"), explode(col("grams")).as("g"))
    }
    spark.stop()
  }
}
