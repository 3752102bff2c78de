package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm sub-pipeline timings of ngramJaccardPairs. */
object NgramVariants {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$sf/documents.parquet")
    def warm(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count()
      val t0 = System.nanoTime(); val n = mk.count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    val grams = df.select(col("doc_id").as("id"), graft.ops.TextOps.tokens(col("text")).as("toks"))
      .select(col("id"), array_distinct(
        graft.ops.TextOps.wordNgramHashesFromTokens(col("toks"), 2)).as("grams"))
    val exploded = grams.select(col("id"), explode(col("grams")).as("g"))
    val rare = exploded.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100 && col("df") >= 2).select("g")
    val candGrams = exploded.join(rare, Seq("g"))
    val l = candGrams.select(col("g"), col("id").as("id_a"))
    val r = candGrams.select(col("g"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("g")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val hashed = grams.select(col("id"), array_sort(col("grams")).as("hg"))
    val gA = hashed.select(col("id").as("id_a"), col("hg").as("g_a"))
    val gB = hashed.select(col("id").as("id_b"), col("hg").as("g_b"))
    val verified = candidates.join(gA, Seq("id_a")).join(gB, Seq("id_b"))

    warm("exploded")(exploded)
    warm("rare")(rare)
    warm("candGrams")(candGrams)
    warm("candidates")(candidates)
    warm("verify-joined")(verified)
    warm("full library q21")(graft.ops.DedupOps.ngramJaccardPairs(df, "doc_id", "text", 2, 0.2))
    spark.stop()
  }
}
