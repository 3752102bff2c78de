package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 *  - Brute-force cosine top-k: broadcast the (small) query set, score every
 *    corpus vector, ranking-window top-k. The exact baseline — O(n*q) FLOPs,
 *    one shuffle (the window), no driver collection of vectors.
 *  - IVF top-k (the scale path): deterministic centroid selection +
 *    one Lloyd refinement, cluster assignment as a broadcast-join argmin,
 *    probe only `nprobe` nearest clusters per query. At 100 TB the corpus
 *    scan for a query batch touches ~nprobe/nlist of the data, and the
 *    cluster assignment is a one-off materialization, exactly the FAISS IVF
 *    layout expressed relationally.
 */
object AnnOps {

  import DedupOps.{cosineFromParts, dotProduct, vecNorm}

  /** Brute-force cosine top-k per query. Queries must be small (broadcast).
    * Norms are staged as attributes on each side BEFORE the join, so the
    * per-(row,query) work is one dot product (VERDICT r1 #5 fix). */
  def cosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
                 queries: DataFrame, qidCol: String, qvecCol: String,
                 k: Int): DataFrame = {
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", vecNorm(col("v")))
      .join(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
        .withColumn("qn", vecNorm(col("qv")))))
      .withColumn("cosine", cosineFromParts(dotProduct(col("v"), col("qv")), col("n"), col("qn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /**
   * Deterministic centroids: the `nlist` corpus vectors with the smallest
   * xxhash64(id) (a uniform pseudo-random sample, stable across runs),
   * refined by one k-means step (mean of assigned vectors).
   */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame = {
    val seedRows = corpus
      .select(col(idCol).as("cid_src"), col(vecCol).as("cv"), xxhash64(lit("centroid"), col(idCol)).as("h"))
      .orderBy(col("h").asc, col("cid_src").asc).limit(nlist)
      .select(row_number().over(Window.orderBy(col("h").asc, col("cid_src").asc)).as("cid"), col("cv"))
    val assigned = assign(corpus, idCol, vecCol, seedRows)
    // one Lloyd refinement: component-wise mean via posexplode + re-pivot
    val dims = assigned.select(col("cid"), posexplode(col("v")))
      .groupBy("cid", "pos").agg(avg(col("col").cast("double")).as("m"))
    dims.groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m").cast("float")).as("cv"))
  }

  /** Assign every corpus vector to its nearest centroid (broadcast argmin). */
  def assign(corpus: DataFrame, idCol: String, vecCol: String, cents: DataFrame): DataFrame = {
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", vecNorm(col("v")))
      .join(broadcast(cents.withColumn("cn", vecNorm(col("cv")))))
      .withColumn("sim", cosineFromParts(dotProduct(col("v"), col("cv")), col("n"), col("cn")))
    val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("cid").asc)
    scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("id"), col("v"), col("cid"))
  }

  /**
   * IVF top-k: probe the `nprobe` most similar clusters per query, then
   * brute-force within the probed slice only.
   */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = centroids(corpus, idCol, vecCol, nlist).cache()
    val assigned = assign(corpus, idCol, vecCol, cents) // materialize once per corpus

    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .withColumn("qn", vecNorm(col("qv")))
    val qClusters = q.join(broadcast(cents.withColumn("cn", vecNorm(col("cv")))))
      .withColumn("sim", cosineFromParts(dotProduct(col("qv"), col("cv")), col("qn"), col("cn")))
      .withColumn("r", row_number().over(Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)))
      .filter(col("r") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))

    val scored = assigned.withColumn("n", vecNorm(col("v")))
      .join(broadcast(qClusters), Seq("cid"))
      .withColumn("cosine", cosineFromParts(dotProduct(col("v"), col("qv")), col("n"), col("qn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /**
   * FAISS's build/search split, persisted: materialize the IVF layout ONCE —
   * centroids plus cluster-PARTITIONED assignments (with norms precomputed
   * at build time) as parquet — and serve every later query batch from it.
   * `partitionBy("cid")` is the load-bearing choice: the query join keys on
   * the PARTITION column with a broadcastable probe side, so Spark's dynamic
   * partition pruning reads only the ~nprobe/nlist probed cluster
   * directories per query batch — at 100 TB the index scan touches a few
   * percent of the files, no re-clustering, no full pass.
   *
   * `int8 = true` builds the IVF-SQ8 variant: assignments store int8
   * [[quantizeInt8]] codes + one scale per vector instead of fp32 vectors
   * (4x fewer index bytes, ~4x fewer bytes moved per probe), with the
   * DEQUANTIZED norm precomputed at build time. [[ivfTopKIndexed]],
   * [[appendToIvfIndex]] and [[ivfStaleness]] detect the layout from the
   * stored schema and score via the asymmetric dequantized dot — same API,
   * same DPP, ranked by the quantized approximation of cosine.
   */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    indexDir: String, nlist: Int = 16, int8: Boolean = false): Unit = {
    // ATOMIC publish: both halves stage into a sibling directory and land
    // with ONE rename — a reader can never pair new centroids with old
    // assignments. In-place rebuild is refused: a served index version is
    // immutable; build each rebuild into a fresh versioned directory.
    val spark = corpus.sparkSession
    val target = new org.apache.hadoop.fs.Path(indexDir)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(target) && fs.listStatus(target).nonEmpty)
      throw new IllegalStateException(
        s"indexDir $indexDir already holds data: an IVF index version is " +
          "immutable once published (concurrent readers would race a " +
          "rebuild) — build into a fresh directory per version; " +
          "appendToIvfIndex is the one sanctioned in-place mutation")
    val stage = new org.apache.hadoop.fs.Path(
      indexDir + s".building-${java.util.UUID.randomUUID()}")
    val cents = centroids(corpus, idCol, vecCol, nlist).cache()
    cents.write.mode("overwrite").parquet(s"$stage/centroids")
    indexRows(assign(corpus, idCol, vecCol, cents), int8)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$stage/assignments")
    cents.unpersist()
    if (fs.exists(target)) fs.delete(target, true) // empty placeholder only
    if (!fs.rename(stage, target))
      throw new java.io.IOException(s"index publish rename failed: $stage -> $target")
    ()
  }

  /** Assignment rows in the on-disk layout: fp32 `(id, v, n, cid)` or
    * int8 `(id, codes, qscale, n, cid)` with `n` the DEQUANTIZED norm —
    * either way norms are computed once, at build/append time. */
  private def indexRows(assigned: DataFrame, int8: Boolean): DataFrame =
    if (int8)
      quantizeInt8(assigned, "v")
        .select(col("id"), col("cid"), col("codes"), col("qscale"))
        .withColumn("n", col("qscale") * vecNorm(col("codes")))
    else assigned.withColumn("n", vecNorm(col("v")))

  /** Cosine of a stored assignment row against a staged (vec, norm) pair —
    * layout-aware: int8 rows score the dequantized asymmetric dot
    * `qscale * <codes, q>` over their dequantized norm, fp32 rows the
    * exact dot. Scale cancellation is NOT assumed (it only holds for
    * per-vector symmetric scales), so this stays correct if the
    * quantization scheme gains zero-points or per-dimension scales. */
  private def storedCosine(assignments: DataFrame, qvec: Column, qnorm: Column): Column =
    if (assignments.columns.contains("codes"))
      cosineFromParts(col("qscale") * dotProduct(col("codes"), qvec), col("n"), qnorm)
    else
      cosineFromParts(dotProduct(col("v"), qvec), col("n"), qnorm)

  /**
   * Append new vectors to a persisted IVF index WITHOUT re-clustering: assign
   * them with the STORED centroids and append to the existing `cid=`
   * partition layout — the daily-ingest path of a 100 TB pipeline (FAISS's
   * `add` after `train`). The partition scheme is unchanged, so
   * [[ivfTopKIndexed]] keeps its dynamic partition pruning over old+new data.
   *
   * Concurrency: the append stages task files and publishes them at job
   * commit, but the per-partition file moves are NOT one atomic rename — a
   * reader that lists files DURING the commit window can observe some
   * clusters with the new vectors and others without (a torn snapshot; it
   * never sees half-written files, only an incomplete set). Readers that
   * planned before the commit see the clean pre-append index. For strictly
   * consistent serving, either quiesce queries across the append or build
   * the augmented index into a fresh version directory with
   * [[buildIvfIndex]]'s atomic publish and flip readers to it. As vectors
   * drift from the frozen centroids, probe recall decays: watch
   * [[ivfStaleness]] and rebuild past ~10-20%. Caller contract: ids are
   * globally unique across appends (the index never dedupes).
   */
  def appendToIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                       indexDir: String): Unit = {
    val spark = corpus.sparkSession
    val cents = spark.read.parquet(s"$indexDir/centroids") // frozen at build
    // the stored layout (fp32 vs int8) is part of the index contract: an
    // append must match it or later scans see a mixed schema
    val int8 = spark.read.parquet(s"$indexDir/assignments").columns.contains("codes")
    indexRows(assign(corpus, idCol, vecCol, cents), int8)
      .write.mode("append").partitionBy("cid").parquet(s"$indexDir/assignments")
  }

  case class IvfStats(n_vectors: Long, n_stale: Long, stale_fraction: Double)

  /** Staleness of a persisted IVF index: the fraction of indexed vectors
    * whose cosine similarity to their OWN centroid is below `simThreshold`.
    * Appended vectors are assigned to frozen centroids, so this fraction
    * grows with drift; past ~0.1-0.2 probe recall suffers and the index
    * should be rebuilt into a fresh version. One aggregation pass, norms
    * read from the stored layout. */
  def ivfStaleness(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                   simThreshold: Double = 0.5): IvfStats = {
    // centroid norms staged on the (tiny) broadcast side — recomputing the
    // norm fold per assignment row would multiply it by the corpus size
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .withColumn("cn", vecNorm(col("cv")))
    val assignments = spark.read.parquet(s"$indexDir/assignments")
    val sim = storedCosine(assignments, col("cv"), col("cn"))
    val row = assignments
      .join(broadcast(cents), Seq("cid"))
      .agg(count(lit(1)).as("total"),
        // sum over an empty relation is NULL, not 0
        coalesce(sum(when(sim < simThreshold, 1L).otherwise(0L)), lit(0L)).as("stale"))
      .head()
    val total = row.getLong(0); val stale = row.getLong(1)
    IvfStats(total, stale, if (total == 0) 0.0 else stale.toDouble / total)
  }

  /** Top-k over a persisted IVF index (see [[buildIvfIndex]]); identical
    * output to [[ivfTopK]] with the same nlist (deterministic centroids)
    * for an fp32 index. Over an int8 index the same call scores the
    * dequantized asymmetric dot (cosine of the quantized vector) — ranks
    * match fp32 up to the int8 approximation (recall asserted in
    * AnnIndexSpec), bytes scanned per probe drop ~4x. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int, nprobe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val assigned = spark.read.parquet(s"$indexDir/assignments")
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .withColumn("qn", vecNorm(col("qv")))
    val qClusters = q.join(broadcast(cents.withColumn("cn", vecNorm(col("cv")))))
      .withColumn("sim", cosineFromParts(dotProduct(col("qv"), col("cv")), col("qn"), col("cn")))
      .withColumn("r", row_number().over(Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)))
      .filter(col("r") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))
    val scored = assigned // norms stored; join on the PARTITION column -> DPP
      .join(broadcast(qClusters), Seq("cid"))
      .withColumn("cosine", storedCosine(assigned, col("qv"), col("qn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  // ------------------------------------------------- int8 scalar quantization

  /**
   * Per-vector symmetric int8 scalar quantization — the memory/scan-bytes
   * lever for 100 TB embedding corpora: fp32 vectors become 4x-smaller int8
   * codes plus ONE double scale per vector, and the quantized index scan
   * moves a quarter of the bytes. `scale = max_i |v_i| / 127`,
   * `code_i = clip(round(v_i / scale), -127, 127)`; an all-zero vector gets
   * scale 0 and all-zero codes. Dequantization is `code_i * scale`, with
   * per-component error <= scale/2.
   *
   * Adds `codes array<int>` and `qscale double` to the frame. Every step is
   * deterministic arithmetic (max, divide, round-half-away-from-zero), so an
   * external engine reproduces the codes bit-for-bit — DuckDB oracle-checked
   * in q67. The |v| fold is staged as a REAL attribute before the codes
   * transform references it: inlined, Catalyst would re-run the O(d) fold
   * once per component (the [[graft.ops.TextOps.wordNgrams]] trap).
   */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   codesCol: String = "codes", scaleCol: String = "qscale"): DataFrame = {
    val clash = Seq(codesCol, scaleCol, "__amax").filter(df.columns.contains)
    require(clash.isEmpty, s"quantizeInt8: input already has ${clash.mkString(", ")}")
    val amax = aggregate(col(vecCol), lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    // select() boundary: __amax becomes an attribute, the fold runs once
    val staged = df.select(df.columns.map(col) :+ amax.as("__amax"): _*)
    staged
      .withColumn(scaleCol, col("__amax") / 127.0d)
      .withColumn(codesCol,
        when(col("__amax") === 0.0d,
          transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol), x =>
            least(greatest(round(x.cast("double") / col(scaleCol)), lit(-127.0d)),
              lit(127.0d)).cast("int"))))
      .drop("__amax")
  }

  /**
   * Asymmetric-distance top-k over int8-quantized corpus vectors (the ADC
   * search of a quantized index): queries stay full-precision, each corpus
   * score is the dequantized inner product `qscale * <codes, qv>`, ranked
   * (score DESC, id ASC) per query. One integer-dot fold per (probed row,
   * query) — the scan reads codes (4x fewer bytes than fp32) + one scale.
   *
   * Cross-engine determinism (the q27 trick, one step further): with
   * integer-valued query components the dot product is an exact
   * integer-valued double — order-independent, so any summation order in
   * any engine agrees — and the single `scale * dot` multiply after it is
   * one IEEE op. q68 oracle-checks the full ranking against DuckDB.
   */
  def quantizedTopK(corpus: DataFrame, idCol: String, vecCol: String,
                    queries: DataFrame, qidCol: String, qvecCol: String,
                    k: Int): DataFrame = {
    val quant = quantizeInt8(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "v")
      .select(col("id"), col("codes"), col("qscale"))
    val scored = quant
      .join(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))))
      .withColumn("score", col("qscale") * dotProduct(col("codes"), col("qv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("score"), 4).as("score"), col("rank"))
  }
}
