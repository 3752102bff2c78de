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
    spark.stop()
  }
}
