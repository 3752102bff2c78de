package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing of ngramJaccardPairs at a given SF dir: counts each pipeline
  * prefix to localize the cost. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$sf/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val n = 2
    val grams = df.select(col("doc_id").as("id"),
        graft.ops.TextOps.tokens(col("text")).as("toks"))
      .select(col("id"), array_distinct(
        graft.ops.TextOps.wordNgramHashesFromTokens(col("toks"), n)).as("grams"))
    val exploded = grams.select(col("id"), explode(col("grams")).as("g"))
    time("exploded count")(println("  rows=" + exploded.count()))
    val rare = exploded.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100 && col("df") >= 2).select("g")
    time("rare count")(println("  rows=" + rare.count()))
    val candGrams = exploded.join(rare, Seq("g"))
    time("candGrams count")(println("  rows=" + candGrams.count()))
    val l = candGrams.select(col("g"), col("id").as("id_a"))
    val r = candGrams.select(col("g"), col("id").as("id_b"))
    val rawCand = l.join(r, Seq("g")).filter(col("id_a") < col("id_b"))
    time("raw candidate pairs count")(println("  rows=" + rawCand.count()))
    val candidates = rawCand.select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    time("distinct candidates count")(println("  rows=" + candidates.count()))
    time("full q21")(println("  rows=" + graft.ops.DedupOps
      .ngramJaccardPairs(df, "doc_id", "text", n = 2, threshold = 0.2).count()))
    spark.stop()
  }
}
