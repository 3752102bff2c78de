package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution for q57 (portable MinHash twin): times each pipeline
  * prefix at sf0.1 so optimization targets the measured stage, not a guess. */
object Q57Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hash = graft.ops.PipelineOps.portableHash64 _
    val k = 5
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"),
        regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
    def shingles = docs.select(col("id"),
      when(length(col("norm")) < k, array(col("norm")))
        .otherwise(array_distinct(transform(sequence(lit(0), length(col("norm")) - k),
          i => col("norm").substr(i + 1, lit(k))))).as("shingles"))
    def withH = shingles.withColumn("hs", transform(col("shingles"), s => hash(s)))
    def withSig = withH.withColumn("sig",
      array((0 until 16).map(i =>
        array_min(transform(col("hs"), h => h.bitwiseXOR(lit(graft.ops.DedupOps.slotSalt(i)))))): _*))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q57prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm one pass
    withSig.select(sum(shiftrightunsigned(element_at(col("sig"), 1), 32))).head()
    time("shingles only")(shingles.select(sum(size(col("shingles")))).head())
    time("+hs (1 md5 pass)")(withH.select(sum(shiftrightunsigned(element_at(col("hs"), 1), 32))).head())
    time("+sig (16 xor-min passes)")(withSig.select(sum(shiftrightunsigned(element_at(col("sig"), 1), 32))).head())
    for (i <- 1 to 3)
      time(s"full q57 (run $i)")(graft.SparkEntry.queries("q57_minhash_portable")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
