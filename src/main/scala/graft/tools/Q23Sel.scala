package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.DedupOps
object Q23Sel {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val k = 5
    val prep = df.select(col("doc_id").as("id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
    val reps = prep.groupBy(md5(col("norm")).as("fp"))
      .agg(min(struct(col("id"), col("norm"))).as("rep"))
      .select(col("rep.id").as("id"), col("rep.norm").as("norm"))
    val withShingles = reps.select(col("id"),
      when(length(col("norm")) < k, array(col("norm")))
        .otherwise(transform(sequence(lit(0), length(col("norm")) - k),
          i => col("norm").substr(i + 1, lit(k)))).as("shingles"))
    val sizes = withShingles.select(col("id"),
      size(array_distinct(transform(col("shingles"), s => xxhash64(s)))).as("sz")).cache()
    println("size stats:")
    sizes.select(min("sz"), max("sz"), avg("sz"), expr("percentile(sz, array(0.1,0.5,0.9))")).show(false)
    val withSig = withShingles.withColumn("sig", graft.functions.SketchExprs.minhash_sig(col("shingles"), 32))
    val banded = withSig.select(col("id"),
      posexplode(array((0 until 8).map(b =>
        xxhash64(lit("band"), lit(b), concat_ws(",", slice(col("sig"), b * 4 + 1, 4)))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .localCheckpoint()
    val l = banded.select(col("band"), col("band_key"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("band_key"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band", "band_key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b")).cache()
    val total = cand.count()
    val kept = cand.filter(least(col("sz_a"), col("sz_b")).cast("double") >=
      greatest(col("sz_a"), col("sz_b")) * 0.4).count()
    println(s"candidates=$total keptBySizeBound=$kept")
    spark.stop()
  }
}
