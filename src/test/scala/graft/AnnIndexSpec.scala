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

  test("exhaustive probe (nprobe = nlist) reproduces brute force exactly") {
    // the q26 oracle premise: probing every cluster scores every
    // (vector, query) pair once, so IVF == cosineTopK by construction
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("vq", transform(col("embedding"), x => round(x * 1000, 0).cast("double")))
    val q = e.filter(col("vec_id") < 5)
    val ivf = AnnOps.ivfTopK(e, "vec_id", "vq", q, "vec_id", "vq",
      k = 10, nlist = 8, nprobe = 8).orderBy("qid", "rank").collect()
    val brute = AnnOps.cosineTopK(e, "vec_id", "vq", q, "vec_id", "vq", k = 10)
      .orderBy("qid", "rank").collect()
    assert(ivf.map(_.toString).toSeq === brute.map(_.toString).toSeq)
  }

  test("append assigns with stored centroids; queries see old+new; staleness reported") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = e.filter(col("vec_id") % 2 === 0)
    val extra = e.filter(col("vec_id") % 2 === 1)
    val queries = e.filter(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("ivfappend").toString

    AnnOps.buildIvfIndex(base, "vec_id", "embedding", idx, nlist = 4)
    val before = AnnOps.ivfTopKIndexed(spark, idx, queries, "vec_id", "embedding",
      k = 5, nprobe = 4).collect()
    AnnOps.appendToIvfIndex(extra, "vec_id", "embedding", idx)

    // full index (old + new) must answer exactly like an index built over
    // the union WITH THE SAME centroids: compare against in-memory scoring
    // of the union restricted to the stored centroid assignment
    val after = AnnOps.ivfTopKIndexed(spark, idx, queries, "vec_id", "embedding",
      k = 5, nprobe = 4).orderBy("qid", "rank").collect()
    val ids = after.map(_.getAs[Any]("id").toString).toSet
    assert(after.length >= before.length)
    assert(extra.select("vec_id").collect().map(_.get(0).toString).toSet
      .intersect(ids).nonEmpty, "appended vectors must be reachable")
    // exhaustive probe over the appended index == brute force over the union
    val bruteAll = AnnOps.cosineTopK(e, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5).orderBy("qid", "rank").collect()
    val ivfAll = AnnOps.ivfTopKIndexed(spark, idx, queries, "vec_id", "embedding",
      k = 5, nprobe = 4).orderBy("qid", "rank").collect()
    assert(ivfAll.map(_.toString).toSeq === bruteAll.map(_.toString).toSeq)

    // DPP still prunes after the append (layout unchanged)
    val plan = AnnOps.ivfTopKIndexed(spark, idx, queries, "vec_id", "embedding", 5, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"))

    val stats = AnnOps.ivfStaleness(spark, idx, simThreshold = 0.5)
    assert(stats.n_vectors === e.count())
    assert(stats.n_stale >= 0 && stats.stale_fraction >= 0.0 && stats.stale_fraction <= 1.0)
    // a sane threshold classifies SOME fraction deterministically — rerun agrees
    assert(AnnOps.ivfStaleness(spark, idx, 0.5) === stats)
  }
}
