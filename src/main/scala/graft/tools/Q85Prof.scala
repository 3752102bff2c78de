package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q85 component timing at sf0.1: the md5 vs rolling key kernels, the
  * shingle aggregate alone, and the full op under both key families. */
object Q85Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val k = 8
    val toksed = docs.select(col("doc_id").as("id"), col("doc_id").as("ord"),
      graft.ops.TextOps.tokens(col("text")).as("toks"))
    val md5keys = transform(sequence(lit(0), size(col("toks")) - k),
      i => md5(concat_ws(" ", slice(col("toks"), i + 1, lit(k)))))
    val rollkeys = graft.functions.SketchExprs.rolling_token_hashes(col("toks"), k)
    time("tokenize only") { noop(toksed) }
    time("shingled md5") { noop(toksed.filter(size(col("toks")) >= k)
      .select(col("id"), col("ord"), posexplode(md5keys))) }
    time("shingled rolling") { noop(toksed.filter(size(col("toks")) >= k)
      .select(col("id"), col("ord"), posexplode(rollkeys))) }
    time("firsts agg (md5 keys, dec-min+count)") {
      val sh = toksed.filter(size(col("toks")) >= k)
        .select(col("id"), col("ord"), posexplode(md5keys))
        .withColumnRenamed("pos", "p").withColumnRenamed("col", "h")
      val enc = col("ord").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
        lit(2147483648L) + col("p")
      noop(sh.groupBy("h").agg(min(enc).as("fenc"), count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2))
    }
    time("full op md5") { noop(graft.ops.DedupOps.exactSubstringDedup(
      docs, "doc_id", "text", minTokens = 8, portableKeys = true)) }
    time("full op rolling") { noop(graft.ops.DedupOps.exactSubstringDedup(
      docs, "doc_id", "text", minTokens = 8, portableKeys = false)) }
    spark.stop()
  }
}
