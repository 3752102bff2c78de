package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Current-kernel stage attribution for q23 at sf0.1 (noop-sink prefixes). */
object Q23Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val k = 5; val numHashes = 32; val bandsCount = 8; val rowsPerBand = 4
    val prep = df.select(col("doc_id").as("id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
    val grouped = prep.groupBy(md5(col("norm")).as("fp"))
      .agg(sort_array(collect_list(col("id"))).as("ids"),
        min(struct(col("id"), col("norm"))).as("rep"))
    val reps = grouped.select(col("rep.id").as("id"), col("rep.norm").as("norm"))
    val withH = reps.select(col("id"),
      graft.functions.SketchExprs.xx_shingle_hashes(col("norm"), k).as("hs"))
    val withSig = withH
      .withColumn("sig", graft.functions.SketchExprs.minhash_sig_from_hashes(col("hs"), numHashes))
    val banded = withSig.select(col("id"),
      posexplode(array((0 until bandsCount).map(b =>
        xxhash64(lit("band"), lit(b), concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .repartition(col("band"), col("band_key"))
    val left = banded.select(col("band"), col("band_key"), col("id").as("id_a"))
    val right = banded.select(col("band"), col("band_key"), col("id").as("id_b"))
    val candidates = left.join(right, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    // warm
    noop(candidates)
    time("prep scan")(noop(prep))
    time("grouped agg")(noop(grouped))
    time("withH kernel")(noop(withH))
    time("withSig kernel")(noop(withSig))
    time("banded (+exchange)")(noop(banded))
    time("candidates (join+dedup)")(noop(candidates))
    time("FULL q23")(noop(graft.ops.DedupOps.minhashLshPairs(df, "doc_id", "text", 5, 32, 8, 0.4)))
    spark.stop()
  }
}
