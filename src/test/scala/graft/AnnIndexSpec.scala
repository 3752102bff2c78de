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

  test("int8 quantization: codes bounded, error <= scale/2, zero vector, staged fold") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val withZero = e.unionByName(
      Seq((-1L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val q = AnnOps.quantizeInt8(withZero, "embedding").collect()
    assert(q.length === withZero.count())
    q.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
      val codes = r.getAs[scala.collection.Seq[Int]]("codes")
      val scale = r.getAs[Double]("qscale")
      assert(codes.length === v.length)
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(scale >= 0.0)
      if (r.getLong(0) == -1L) {
        assert(scale === 0.0 && codes.forall(_ === 0), "zero vector: scale 0, codes 0")
      } else {
        // dequantization error bound of symmetric scalar quantization
        v.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c * scale) <= scale / 2 + 1e-12,
            s"|$x - $c*$scale| > scale/2")
        }
        assert(codes.exists(c => math.abs(c) === 127), "max component must hit ±127")
      }
    }

    // the |v| max-fold is staged as an attribute: ONE aggregate in the
    // optimized plan, not one per codes component (the HOF-recompute trap)
    val opt = AnnOps.quantizeInt8(e, "embedding").queryExecution.optimizedPlan.toString
    val folds = "aggregate\\(".r.findAllIn(opt).size
    assert(folds === 1, s"expected the single staged amax fold, saw $folds:\n" + opt.take(1500))

    // asymmetric-distance ranking: recall@10 vs the exact inner-product
    // top-k on the same integer-valued queries (deterministic fixture; int8
    // on 64 dims measured lossless here — assert a margin below that)
    val queries = e.filter(col("vec_id") < 5).select(col("vec_id"),
      transform(col("embedding"), x => round(x * 1000, 0).cast("double")).as("qv"))
    val quant = AnnOps.quantizedTopK(e, "vec_id", "embedding",
      queries, "vec_id", "qv", k = 10)
      .select("qid", "id").collect().map(r => (r.get(0).toString, r.get(1).toString)).toSet
    val exactScored = e.join(broadcast(queries.withColumnRenamed("vec_id", "qid")))
      .withColumn("score", graft.ops.DedupOps.dotProduct(col("embedding"), col("qv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id").asc)
    val exact = exactScored.withColumn("r", row_number().over(w)).filter(col("r") <= 10)
      .select("qid", "vec_id").collect().map(r => (r.get(0).toString, r.get(1).toString)).toSet
    val recall = quant.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall@10 = $recall")
  }

  test("int8 IVF index: same API, ~4x smaller rows, append + staleness honor the layout") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 5)
    val fp32 = java.nio.file.Files.createTempDirectory("ivf32").toString
    val sq8 = java.nio.file.Files.createTempDirectory("ivfsq8").toString
    AnnOps.buildIvfIndex(e, "vec_id", "embedding", fp32, nlist = 8)
    AnnOps.buildIvfIndex(e, "vec_id", "embedding", sq8, nlist = 8, int8 = true)

    // stored layout: codes + per-vector scale, no fp32 vector column
    val stored = spark.read.parquet(s"$sq8/assignments")
    assert(stored.columns.toSet === Set("id", "codes", "qscale", "n", "cid"))

    // same search API; DPP still prunes; ranks match fp32 up to int8 error
    val exact = AnnOps.ivfTopKIndexed(spark, fp32, queries, "vec_id", "embedding",
      k = 10, nprobe = 8).select("qid", "id")
      .collect().map(r => (r.get(0).toString, r.get(1).toString)).toSet
    val qRes = AnnOps.ivfTopKIndexed(spark, sq8, queries, "vec_id", "embedding",
      k = 10, nprobe = 8)
    val quant = qRes.select("qid", "id")
      .collect().map(r => (r.get(0).toString, r.get(1).toString)).toSet
    val recall = quant.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8-index recall@10 vs fp32 index = $recall")
    val plan = qRes.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"))

    // append detects the int8 layout: new rows carry codes, are reachable
    val extra = Seq((9001L, Seq.fill(64)(0.5f)), (9002L, Seq.fill(64)(-0.25f)))
      .toDF("vec_id", "embedding")
    AnnOps.appendToIvfIndex(extra, "vec_id", "embedding", sq8)
    val appended = spark.read.parquet(s"$sq8/assignments")
    assert(appended.columns.toSet === Set("id", "codes", "qscale", "n", "cid"))
    assert(appended.count() === e.count() + 2)
    val afterIds = AnnOps.ivfTopKIndexed(spark, sq8, extra, "vec_id", "embedding",
      k = 3, nprobe = 8).select("id")
      .collect().map(_.get(0).toString).toSet
    assert(afterIds.contains("9001") && afterIds.contains("9002"),
      "appended vectors must be their own nearest neighbors")

    // staleness scores the quantized rows; deterministic across reruns
    val stats = AnnOps.ivfStaleness(spark, sq8, simThreshold = 0.5)
    assert(stats.n_vectors === e.count() + 2)
    assert(stats.stale_fraction >= 0.0 && stats.stale_fraction <= 1.0)
    assert(AnnOps.ivfStaleness(spark, sq8, 0.5) === stats)
  }
}
