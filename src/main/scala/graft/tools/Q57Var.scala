package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.DedupOps.slotSalt

/** A/B variants of minhashLshPairsPortable's staging strategy at sf0.1:
  * eager localCheckpoint (current), lazy, none, and persist. Outputs are
  * identical by construction; timings decide. */
object Q57Var {
  def variant(df: DataFrame, stage: String): DataFrame = {
    val numHashes = 16; val bandsCount = 4; val rowsPerBand = 4
    val k = 5; val threshold = 0.4
    val prep = df.select(col("doc_id").as("id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
    val withH0 = prep.select(col("id"),
      graft.functions.SketchExprs.portable_shingle_hashes(col("norm"), k).as("hs"))
    val withH = stage match {
      case "eager" => withH0.localCheckpoint(true)
      case "lazy" => withH0.localCheckpoint(false)
      case "persist" => withH0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case "none" => withH0
    }
    val withSig = withH.withColumn("sig",
      array((0 until numHashes).map(i =>
        array_min(transform(col("hs"), h => h.bitwiseXOR(lit(slotSalt(i)))))): _*))
    val banded = withSig.select(col("id"),
      posexplode(array((0 until bandsCount).map(b =>
        concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .repartition(col("band"), col("band_key"))
    val left = banded.select(col("band"), col("band_key"), col("id").as("id_a"))
    val right = banded.select(col("band"), col("band_key"), col("id").as("id_b"))
    val candidates = left.join(right, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val shA = withH.select(col("id").as("id_a"), col("hs").as("sh_a"))
    val shB = withH.select(col("id").as("id_b"), col("hs").as("sh_b"))
    val inter = graft.functions.ArraySetOps
      .sorted_intersect_count(col("sh_a"), col("sh_b")).cast("double")
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    candidates.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("jaccard", when(union === 0, lit(1.0)).otherwise(inter / union))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm
    variant(docs, "none").write.format("noop").mode("overwrite").save()
    for (st <- Seq("eager", "lazy", "none", "persist", "eager", "lazy", "none", "persist")) {
      val t0 = System.nanoTime()
      val out = variant(docs, st)
      out.write.format("noop").mode("overwrite").save()
      println(f"q57 stage=$st: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
