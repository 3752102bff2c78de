package graft

import org.apache.spark.sql.functions._

import graft.ops.AnnOps

/** Persisted IVF index (build/search split): identical results to the
  * in-memory path, and the query scan dynamic-partition-prunes to the
  * probed clusters. */
class AnnIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("indexed IVF top-k equals the in-memory IVF; scan is partition-pruned") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("ivfidx").toString

    AnnOps.buildIvfIndex(e, "vec_id", "embedding", idx, nlist = 8)
    // layout: centroids + cid=<n>/ partition directories
    val assignDirs = new java.io.File(s"$idx/assignments").list().filter(_.startsWith("cid="))
    assert(assignDirs.length === 8, assignDirs.mkString(","))

    val direct = AnnOps.ivfTopK(e, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, nlist = 8, nprobe = 3)
      .orderBy("qid", "rank").collect()
    val indexed = AnnOps.ivfTopKIndexed(spark, idx, queries, "vec_id", "embedding",
      k = 10, nprobe = 3)
      .orderBy("qid", "rank").collect()
    assert(indexed.length === direct.length)
    assert(indexed.map(_.toString).toSeq === direct.map(_.toString).toSeq)

    // the probed-cluster join keys on the PARTITION column with a broadcast
    // side: dynamic partition pruning reaches the index scan
    val plan = AnnOps.ivfTopKIndexed(spark, idx, queries, "vec_id", "embedding", 10, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      plan.take(2000))
  }
}
