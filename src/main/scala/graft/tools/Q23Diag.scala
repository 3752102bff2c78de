package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, TextOps}

object Q23Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val withShingles = df.select(col("doc_id").as("id"),
      TextOps.charShingles(col("text"), 5).as("shingles"))
    var t0 = System.nanoTime()
    println("docs=" + withShingles.count() + " avg shingles=" +
      withShingles.select(avg(size(col("shingles")))).head().getDouble(0))
    println(f"shingle time ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val withSig = withShingles.withColumn("sig", DedupOps.minhashSignature(col("shingles"), 32))
    val banded = withSig.select(col("id"),
      posexplode(array((0 until 8).map(b =>
        xxhash64(lit("band"), lit(b), concat_ws(",", slice(col("sig"), b * 4 + 1, 4)))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .localCheckpoint()
    println("banded rows=" + banded.count())
    println(f"sig+band time ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val l = banded.select(col("band"), col("band_key"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("band_key"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band", "band_key")).filter(col("id_a") < col("id_b"))
    println("raw candidate pairs=" + cand.count())
    println("distinct candidate pairs=" + cand.select("id_a", "id_b").distinct().count())
    println(f"candidate time ${(System.nanoTime()-t0)/1e9}%.1f s")
    // biggest band buckets
    banded.groupBy("band", "band_key").count().orderBy(col("count").desc).show(5)
    spark.stop()
  }
}
