package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm sub-pipeline timings of minhashLshPairs at SPARK_GRAFT_SF_DIR. */
object MinhashProfile {
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
    import graft.ops.DedupOps
    val k = 5; val numHashes = 32; val bandsCount = 8; val rowsPerBand = 4
    val prep = df.select(col("doc_id").as("id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
    val grouped = prep.groupBy(md5(col("norm")).as("fp"))
      .agg(sort_array(collect_list(col("id"))).as("ids"),
        min(struct(col("id"), col("norm"))).as("rep"))
    val reps = grouped.select(col("rep.id").as("id"), col("rep.norm").as("norm"))
    val withShingles = reps.select(col("id"),
      when(length(col("norm")) < k, array(col("norm")))
        .otherwise(transform(sequence(lit(0), length(col("norm")) - k),
          i => col("norm").substr(i + 1, lit(k)))).as("shingles"))
    val withSig = withShingles.withColumn("sig", DedupOps.minhashSignature(col("shingles"), numHashes))
    val banded = withSig.select(col("id"),
      posexplode(array((0 until bandsCount).map(b =>
        xxhash64(lit("band"), lit(b), concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val left = banded.select(col("band"), col("band_key"), col("id").as("id_a"))
    val right = banded.select(col("band"), col("band_key"), col("id").as("id_b"))
    val candidates = left.join(right, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    warm("grouped (reps agg)")(reps)
    warm("withShingles")(withShingles)
    warm("withSig")(withSig)
    warm("banded")(banded)
    warm("candidates")(candidates)
    warm("full library q23")(DedupOps.minhashLshPairs(df, "doc_id", "text", 5, 32, 8, 0.4))
    spark.stop()
  }
}
