package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives the persisted IVF index end-to-end: build over the embeddings
  * table, query from the stored index, show the pruned scan. */
object IvfIndexDemo {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivf-demo").toString
    graft.ops.AnnOps.buildIvfIndex(e, "vec_id", "embedding", idx, nlist = 8)
    val res = graft.ops.AnnOps.ivfTopKIndexed(spark, idx,
      e.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5, nprobe = 3)
    println(s"results: ${res.count()} rows")
    val plan = res.queryExecution.executedPlan.toString
    println("dynamic partition pruning in scan: " +
      (plan.contains("dynamicpruning") || plan.contains("DynamicPruning")))

    // int8 (IVF-SQ8) variant: same API, quantized assignment rows
    val sq8 = java.nio.file.Files.createTempDirectory("ivf-demo-sq8").toString
    graft.ops.AnnOps.buildIvfIndex(e, "vec_id", "embedding", sq8, nlist = 8, int8 = true)
    val qRes = graft.ops.AnnOps.ivfTopKIndexed(spark, sq8,
      e.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5, nprobe = 3)
    val overlap = qRes.select("qid", "id").collect().map(_.toString).toSet
      .intersect(res.select("qid", "id").collect().map(_.toString).toSet).size
    println(s"int8 index: ${qRes.count()} rows, top-k overlap with fp32: $overlap/${res.count()}")
    val bytes32 = dirBytes(s"$idx/assignments"); val bytes8 = dirBytes(s"$sq8/assignments")
    println(f"assignment bytes fp32=$bytes32 int8=$bytes8 ratio=${bytes32.toDouble / bytes8}%.2f")
    spark.stop()
  }

  private def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
    walk(new java.io.File(dir))
  }
}
